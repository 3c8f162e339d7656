"""WordNet semantic distances (JCN / LIN) with a deterministic fallback.

Reference: ``MinWordNetDistFromClassExamplesFeatureExtractor``
(matcher/.../features/MinWordNetDistFromClassExamplesFeatureExtractor.scala:35-266)
computes minimum Jiang-Conrath and Lin distances between tokenized column
names and class example names via WS4J.

This rebuild uses nltk's WordNet when the corpus is installed; otherwise a
deterministic embedded thesaurus of common schema-vocabulary tokens stands
in (clean contract: same [0, 1] distance scale, 0 = identical). The active
backend is reported by ``backend()`` so tests and docs stay honest.

Distances are applied to column-NAME tokens only (metadata, O(#columns)
strings) — driver-side or inside a broadcast-joined pandas UDF, never on
row data.
"""

from __future__ import annotations

from functools import lru_cache

from serene_spark.functions.stemmer import stem

try:  # pragma: no cover - depends on environment
    from nltk.corpus import wordnet as _wn
    from nltk.corpus import wordnet_ic as _wn_ic

    _IC = _wn_ic.ic("ic-brown.dat")
    _HAVE_WORDNET = True
except Exception:  # ImportError or missing corpus download
    _wn = None
    _IC = None
    _HAVE_WORDNET = False


def backend() -> str:
    if _HAVE_WORDNET:
        return "nltk-wordnet"
    from serene_spark.functions import wordnet_real

    if wordnet_real.available():
        return "princeton-dict"
    return "fallback-thesaurus"


# Embedded thesaurus for the fallback: synonym groups over the vocabulary
# that actually occurs in schema column names. Same-group tokens get a small
# fixed distance; identical stems get 0; everything else is 1.
_SYNONYM_GROUPS: tuple[frozenset[str], ...] = tuple(
    frozenset(g)
    for g in (
        {"name", "title", "label", "caption"},
        {"phone", "telephone", "mobile", "fax", "tel"},
        {"price", "cost", "amount", "fee", "charge", "total"},
        {"date", "day", "time", "year", "month", "timestamp"},
        {"address", "location", "street", "city", "suburb", "place"},
        {"person", "customer", "client", "user", "contact", "owner"},
        {"id", "key", "code", "identifier", "number", "num"},
        {"size", "area", "length", "width", "extent"},
        {"email", "mail"},
        {"description", "comment", "note", "text", "remark"},
        {"company", "business", "firm", "organization", "agency"},
        {"country", "nation", "state", "region", "territory"},
        {"balance", "account", "credit"},
        {"order", "purchase", "sale", "transaction"},
    )
)
_SAME_GROUP_DIST = 0.25


@lru_cache(maxsize=4096)
def _fallback_dist(a: str, b: str) -> float:
    sa, sb = stem(a), stem(b)
    if sa == sb:
        return 0.0
    for group in _SYNONYM_GROUPS:
        if (a in group or sa in group) and (b in group or sb in group):
            return _SAME_GROUP_DIST
    return 1.0


@lru_cache(maxsize=4096)
def _wordnet_dist(a: str, b: str, metric: str) -> float:  # pragma: no cover
    syns_a = _wn.synsets(a) or _wn.synsets(stem(a))
    syns_b = _wn.synsets(b) or _wn.synsets(stem(b))
    best = 0.0
    for s1 in syns_a[:4]:
        for s2 in syns_b[:4]:
            if s1.pos() != s2.pos() or s1.pos() not in ("n", "v"):
                continue
            try:
                sim = (
                    s1.jcn_similarity(s2, _IC)
                    if metric == "jcn"
                    else s1.lin_similarity(s2, _IC)
                )
            except Exception:
                continue
            if metric == "jcn":
                sim = sim / (1.0 + sim)  # unbounded -> (0, 1)
            best = max(best, min(sim, 1.0))
    return round(1.0 - best, 6)


def token_distance(a: str, b: str, metric: str = "jcn") -> float:
    """Distance in [0, 1] between two tokens (0 = same concept).

    Tiered: nltk JCN/LIN when its corpora are installed; else the real
    Princeton dict (functions/wordnet_real.py — the reference's own
    synonym-graph metric, WordNetDistanceMetric.scala, over the same
    database the reference bundles) when one is on disk; else the
    deterministic embedded thesaurus."""
    a, b = a.lower(), b.lower()
    if a == b:
        return 0.0
    if _HAVE_WORDNET:
        return _wordnet_dist(a, b, metric)
    from serene_spark.functions import wordnet_real

    if wordnet_real.available():
        return _real_dict_dist(a, b)
    return _fallback_dist(a, b)


@lru_cache(maxsize=4096)
def _real_dict_dist(a: str, b: str) -> float:
    from serene_spark.functions import wordnet_real

    try:
        return round(wordnet_real.wordnet_graph_distance(a, b), 6)
    except Exception:
        return _fallback_dist(a, b)


def min_token_set_distance(
    tokens_a: list[str], tokens_b: list[str], metric: str = "jcn"
) -> float:
    """Best-alignment minimum over the token-pair matrix — the reference
    takes the min pairwise WordNet distance between the two token sets
    (MinWordNetDistFromClassExamplesFeatureExtractor.scala:92-131)."""
    if not tokens_a or not tokens_b:
        return 1.0
    return min(token_distance(a, b, metric) for a in tokens_a for b in tokens_b)
