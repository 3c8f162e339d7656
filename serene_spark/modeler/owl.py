"""OWL ontology parsing (Turtle and RDF/XML subsets) → ``Ontology``.

The reference stores uploaded OWL files and parses them with Apache Jena
(core/.../OwlAPI.scala:181, storage OwlStorage), then feeds the class /
property / subclass structure into Karma's alignment graph. This module
parses the same *structural* subset — ``owl:Class``, ``owl:ObjectProperty``,
``owl:DatatypeProperty``, ``rdfs:subClassOf``, ``rdfs:domain``,
``rdfs:range`` — from the two serializations the reference's fixtures use
(``.ttl`` Turtle, ``.owl`` RDF/XML), with no external RDF library.
Restrictions, imports, annotations and other axioms are ignored, matching
what Karma's graph construction actually consumes.

Driver-side and tiny by design: ontologies are O(100) triples; no Spark.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from serene_spark.modeler.ssd import OWL_THING, Ontology

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
RDF_TYPE = RDF + "type"


def local_name(uri: str) -> str:
    """Fragment after ``#``, else the last path segment — Jena's
    ``getLocalName`` convention used throughout the reference's node labels."""
    uri = uri.strip("<>")
    if "#" in uri:
        return uri.rsplit("#", 1)[1]
    return uri.rstrip("/").rsplit("/", 1)[-1]


# --- Turtle ------------------------------------------------------------------


def _tokenize_turtle(text: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
        elif c == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "<":
            j = text.index(">", i)
            toks.append(text[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                if text[j] == "\\":
                    j += 1
                j += 1
            toks.append(text[i : j + 1])
            i = j + 1
        elif c in ";,.":
            toks.append(c)
            i += 1
        else:
            j = i
            while j < n and text[j] not in ' \t\r\n;,<"' and not (
                text[j] == "." and (j + 1 >= n or text[j + 1] in " \t\r\n")
            ):
                j += 1
            toks.append(text[i:j])
            i = j
    return toks


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    """Triples from the Turtle subset: ``@prefix``/``@base`` headers, then
    ``subject pred obj ; pred obj , obj .`` statements. IRIs are expanded to
    full form; the ``a`` keyword becomes ``rdf:type``."""
    toks = _tokenize_turtle(text)
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str]] = []

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        if tok == "a":
            return RDF_TYPE
        if ":" in tok:
            p, _, local = tok.partition(":")
            return prefixes.get(p, p + ":") + local
        return tok

    i = 0
    while i < len(toks):
        t = toks[i]
        if t.lower() in ("@prefix", "prefix"):
            prefixes[toks[i + 1].rstrip(":")] = toks[i + 2].strip("<>")
            i += 3
            if i < len(toks) and toks[i] == ".":
                i += 1
            continue
        if t.lower() in ("@base", "base"):
            i += 2
            if i < len(toks) and toks[i] == ".":
                i += 1
            continue
        subj = expand(t)
        i += 1
        while i < len(toks) and toks[i] != ".":
            pred = expand(toks[i])
            i += 1
            while i < len(toks):
                triples.append((subj, pred, expand(toks[i])))
                i += 1
                if i < len(toks) and toks[i] == ",":
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ";":
                i += 1
            else:
                break
        i += 1  # closing '.'
    return triples


# --- RDF/XML -----------------------------------------------------------------

_TYPED = {
    f"{{{OWL}}}Class": OWL + "Class",
    f"{{{OWL}}}ObjectProperty": OWL + "ObjectProperty",
    f"{{{OWL}}}DatatypeProperty": OWL + "DatatypeProperty",
    # RDFS-flavored vocabularies (FOAF, dcterms, rdaGr2 in the museum
    # preloaded-ontologies) type with rdfs:Class / rdf:Property elements;
    # plain rdf:Property is classified by its range in ontology_from_triples
    f"{{{RDFS}}}Class": OWL + "Class",
    f"{{{RDF}}}Property": RDF + "Property",
}
_CHILD_PREDS = {
    f"{{{RDFS}}}subClassOf": RDFS + "subClassOf",
    f"{{{RDFS}}}domain": RDFS + "domain",
    f"{{{RDFS}}}range": RDFS + "range",
    f"{{{RDF}}}type": RDF_TYPE,
}


def parse_rdfxml(text: str) -> list[tuple[str, str, str]]:
    """Triples from the typed-element RDF/XML form Protégé emits (the
    reference fixtures' shape): ``<owl:Class rdf:about=...>`` elements with
    ``rdfs:subClassOf`` / ``rdfs:domain`` / ``rdfs:range`` resource children."""
    root = ET.fromstring(text)
    triples: list[tuple[str, str, str]] = []
    for el in root:
        about = el.get(f"{{{RDF}}}about")
        if about is None:
            continue
        if el.tag in _TYPED:
            triples.append((about, RDF_TYPE, _TYPED[el.tag]))
        for child in el:
            pred = _CHILD_PREDS.get(child.tag)
            res = child.get(f"{{{RDF}}}resource")
            if pred and res:
                triples.append((about, pred, res))
    return triples


# --- triples → Ontology ------------------------------------------------------


def ontology_from_triples(triples: list[tuple[str, str, str]]) -> Ontology:
    """Interpret the structural subset. Properties with no declared domain or
    range get ``Thing`` (compatible with every class — Karma's thingNode
    behavior); a property with several ``rdfs:domain`` axioms keeps the
    lexicographically first as primary and the rest in ``extra_domains``."""
    classes: set[str] = set()
    obj_props: set[str] = set()
    data_props: set[str] = set()
    plain_props: set[str] = set()  # rdf:Property, classified by range below
    domains: dict[str, set[str]] = {}
    ranges: dict[str, set[str]] = {}
    raw_ranges: dict[str, set[str]] = {}  # full URIs, for Literal/XSD tests
    subclass: dict[str, str] = {}
    for s, p, o in triples:
        sl, ol = local_name(s), local_name(o)
        if p == RDF_TYPE and (o == OWL + "Class" or o == RDFS + "Class"):
            classes.add(sl)
        elif p == RDF_TYPE and o == OWL + "ObjectProperty":
            obj_props.add(sl)
        elif p == RDF_TYPE and o == OWL + "DatatypeProperty":
            data_props.add(sl)
        elif p == RDF_TYPE and o == RDF + "Property":
            plain_props.add(sl)
        elif p == RDFS + "subClassOf":
            subclass[sl] = ol
            classes.update((sl, ol))
        elif p == RDFS + "domain":
            domains.setdefault(sl, set()).add(ol)
        elif p == RDFS + "range":
            ranges.setdefault(sl, set()).add(ol)
            raw_ranges.setdefault(sl, set()).add(o)
    # plain rdf:Property (RDFS-flavored vocabularies): a Literal/XSD range
    # makes it a data property; a class-valued range an object property;
    # rangeless plain properties default to DATA (FOAF's untyped mbox-style
    # annotations are literal-valued in practice)
    for prop in plain_props - obj_props - data_props:
        rr = raw_ranges.get(prop, set())
        if rr and all(
            r.startswith("http://www.w3.org/2001/XMLSchema#")
            or r == RDFS + "Literal"
            for r in rr
        ):
            data_props.add(prop)
        elif rr:
            obj_props.add(prop)
        else:
            data_props.add(prop)
    object_properties: dict[str, tuple[str, str]] = {}
    extra_domains: dict[str, set[str]] = {}
    for prop in sorted(obj_props):
        doms = sorted(domains.get(prop, {OWL_THING}))
        rngs = sorted(ranges.get(prop, {OWL_THING}))
        object_properties[prop] = (doms[0], rngs[0])
        if len(doms) > 1:
            extra_domains[prop] = set(doms[1:])
    data_properties = {
        prop: sorted(domains.get(prop, {OWL_THING}))[0] for prop in sorted(data_props)
    }
    return Ontology(
        classes=classes,
        object_properties=object_properties,
        data_properties=data_properties,
        subclass=subclass,
        extra_domains=extra_domains,
    )


def load_ontology_text(text: str) -> Ontology:
    body = text.lstrip()
    # XML may open with comment blocks before the root element (FOAF does);
    # skip them before sniffing the serialization
    while body.startswith("<!--"):
        end = body.find("-->")
        if end < 0:
            break
        body = body[end + 3 :].lstrip()
    if body.startswith("<?xml") or body.startswith("<rdf:RDF") or body.startswith("<RDF"):
        return ontology_from_triples(parse_rdfxml(text))
    return ontology_from_triples(parse_turtle(text))


def load_ontology(path: str) -> Ontology:
    """Parse a ``.ttl`` / ``.owl`` file, auto-detecting the serialization."""
    with open(path, encoding="utf-8") as f:
        return load_ontology_text(f.read())
