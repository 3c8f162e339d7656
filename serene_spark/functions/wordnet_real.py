"""Pure-Python Princeton WordNet 3.0 reader + the reference's real
WordNet distance metrics — no nltk, no Java, just the standard `dict/`
database files (public Princeton license).

The reference bundles WordNet 3.0 at matcher/src/main/resources/wordnet/dict
and builds two metrics on it:

* ``WordNetDistanceMetric`` (matcher/.../nlptools/distance/
  WordNetDistanceMetric.scala) — synonym-expansion graph distance: expand
  the first word's set with related-synset lemmas per step (JWI
  ``getRelatedSynsets`` = all synset-level semantic pointers,
  WordNetSynProvider.scala:16-36); when the sets intersect at depth d the
  distance is ``1 - 1.5^-d``; depth 5 without contact → 1.0.
  ``wordnet_graph_distance`` reproduces it exactly — every gold value in
  WordNetDistanceMetricSpec.scala is pinned to the float in
  tests/test_wordnet_real.py.
* ``WS4JWordNetDistanceMetric`` (same dir, WS4J ``runWUP``) — Wu-Palmer
  similarity over noun hypernym paths; ``wup_similarity`` reproduces
  WS4J's conventions (root-to-synset node counts, the virtual unified
  root) and WS4JWordNetDistanceMetricSpec's alignment golds are pinned.

Database location: ``SERENE_WORDNET_DIR`` env var, else a search list of
conventional install paths. Fetch step for a new environment (public
data): download WordNet-3.0.tar.gz from wordnetcode.princeton.edu (or
`apt install wordnet-base`, or nltk's wordnet corpus) and point
SERENE_WORDNET_DIR at the extracted ``dict`` directory.

Everything is loaded lazily and memoized per process; the metrics run on
column-NAME tokens (metadata cardinality), never row data.
"""

from __future__ import annotations

import os
from functools import lru_cache

_SEARCH_PATHS = (
    "/usr/local/WordNet-3.0/dict",
    "/usr/share/wordnet",
    "/usr/local/share/wordnet",
    os.path.expanduser("~/nltk_data/corpora/wordnet"),
)

_POS_FILES = {"n": "noun", "a": "adj", "s": "adj", "r": "adv", "v": "verb"}


_DIR_MEMO: tuple[str | None, str | None] | None = None  # (env_seen, dir)


def wordnet_dir() -> str | None:
    """The active dict directory, or None when no database is present.
    Memoized per (process, SERENE_WORDNET_DIR value): the fallback tier
    would otherwise stat the search paths on every token comparison."""
    global _DIR_MEMO
    env = os.environ.get("SERENE_WORDNET_DIR")
    if _DIR_MEMO is not None and _DIR_MEMO[0] == env:
        return _DIR_MEMO[1]
    cands = (env,) + _SEARCH_PATHS if env else _SEARCH_PATHS
    found = None
    for d in cands:
        if d and os.path.exists(os.path.join(d, "data.noun")):
            found = d
            break
    _DIR_MEMO = (env, found)
    return found


class WordNetDb:
    """Minimal synset database over the Princeton ``dict/`` files."""

    def __init__(self, dict_dir: str):
        self.dir = dict_dir
        # index: (pos, lemma) -> [synset offsets]
        self.index: dict[tuple[str, str], list[int]] = {}
        # synsets: (pos, offset) -> (lemmas, [(ptr_symbol, tgt_pos, tgt_off, source_target)])
        self.synsets: dict[tuple[str, int], tuple[list[str], list[tuple[str, str, int, str]]]] = {}
        for pos_key, fname in (("n", "noun"), ("a", "adj"), ("r", "adv"), ("v", "verb")):
            self._load_index(pos_key, fname)
            self._load_data(pos_key, fname)

    def _load_index(self, pos: str, fname: str) -> None:
        path = os.path.join(self.dir, f"index.{fname}")
        if not os.path.exists(path):
            return
        with open(path, encoding="latin-1") as f:
            for line in f:
                if line.startswith(" "):
                    continue
                parts = line.split()
                lemma, _pos, synset_cnt, p_cnt = parts[0], parts[1], int(parts[2]), int(parts[3])
                offsets = [int(o) for o in parts[4 + p_cnt + 2:]]
                self.index[(pos, lemma)] = offsets[:synset_cnt]

    def _load_data(self, pos: str, fname: str) -> None:
        path = os.path.join(self.dir, f"data.{fname}")
        if not os.path.exists(path):
            return
        with open(path, encoding="latin-1") as f:
            for line in f:
                if line.startswith(" "):
                    continue
                body = line.split(" | ", 1)[0].split()
                off = int(body[0])
                ss_type = body[2]
                w_cnt = int(body[3], 16)
                lemmas = [body[4 + 2 * i] for i in range(w_cnt)]
                p = 4 + 2 * w_cnt
                p_cnt = int(body[p])
                ptrs = []
                for i in range(p_cnt):
                    sym, t_off, t_pos, st = body[p + 1 + 4 * i: p + 5 + 4 * i]
                    ptrs.append((sym, "a" if t_pos == "s" else t_pos, int(t_off), st))
                key_pos = "a" if ss_type == "s" else pos
                self.synsets[(key_pos, off)] = (lemmas, ptrs)

    # -- JWI-equivalent surface ------------------------------------------

    def noun_synsets(self, lemma: str) -> list[int]:
        return self.index.get(("n", lemma.lower().replace(" ", "_")), [])

    def related_lemmas(self, lemma: str) -> set[str]:
        """JWI WordNetSynProvider.findSynonyms: for every NOUN sense of
        ``lemma``, the lemmas of every RELATED synset (synset-level
        pointers, source_target '0000'), plus the word itself. The word's
        own synset members are deliberately NOT included — the reference
        provider only walks related synsets
        (WordNetSynProvider.scala:21-33)."""
        out: set[str] = set()
        offs = self.noun_synsets(lemma)
        if not offs:
            return out
        for off in offs:
            _lemmas, ptrs = self.synsets[("n", off)]
            for _sym, t_pos, t_off, st in ptrs:
                if st != "0000":  # lexical (word-level) pointer
                    continue
                rel = self.synsets.get((t_pos, t_off))
                if rel:
                    out.update(rel[0])
        out.add(lemma)
        return out

    def hypernyms(self, pos: str, off: int) -> list[int]:
        """Direct hypernym (+ instance hypernym) synsets."""
        _lemmas, ptrs = self.synsets[(pos, off)]
        return [t_off for sym, t_pos, t_off, _st in ptrs
                if sym in ("@", "@i") and t_pos == pos]

    @lru_cache(maxsize=None)
    def root_paths(self, off: int) -> tuple[tuple[int, ...], ...]:
        """All hypernym paths from a noun synset to a root, synset-first."""
        hups = self.hypernyms("n", off)
        if not hups:
            return ((off,),)
        out = []
        for h in hups:
            for p in self.root_paths(h):
                out.append((off,) + p)
        return tuple(out)


_DB: WordNetDb | None = None


def db() -> WordNetDb | None:
    global _DB
    if _DB is None:
        d = wordnet_dir()
        if d is not None:
            _DB = WordNetDb(d)
    return _DB


def available() -> bool:
    return wordnet_dir() is not None


# -- the reference's synonym-graph metric -------------------------------------


def wordnet_graph_distance(s1: str, s2: str, max_distance: int = 5) -> float:
    """Exact re-expression of WordNetDistanceMetric.computeWordNetGraphDistance
    (WordNetDistanceMetric.scala:14-29): breadth-expand {s1} through
    related-synset lemmas; on first intersection with {s2} at depth d the
    distance is ``1 - 1.5**-d`` (Scala's `1.0/1.0-pow(1.5,-d)` parses as
    exactly that); no contact within ``max_distance`` steps → 1.0."""
    d = db()
    if d is None:
        raise RuntimeError("no WordNet database (set SERENE_WORDNET_DIR)")
    set1, set2 = {s1}, {s2}
    exclude: set[str] = set()
    for dist in range(max_distance):
        if set1 & set2:
            return 1.0 - 1.5 ** (-dist)
        exclude = exclude | set1
        set1 = {syn for w in set1 for syn in d.related_lemmas(w)} - exclude
    return 1.0


# -- WS4J-convention Wu-Palmer similarity -------------------------------------


def wup_similarity(w1: str, w2: str) -> float:
    """Wu-Palmer similarity between two noun words, WS4J conventions:
    depth = node count from the (virtual unified) root to the synset, LCS
    = deepest shared subsumer over any sense pair and any hypernym path,
    sim = 2*depth(lcs) / (len1 + len2) where len_i counts nodes from the
    root THROUGH the lcs down to synset_i. Same-synset words score 1.0.
    Unknown words score 0.0 (WS4J returns -Infinity-guarded 0)."""
    d = db()
    if d is None:
        raise RuntimeError("no WordNet database (set SERENE_WORDNET_DIR)")
    offs1, offs2 = d.noun_synsets(w1), d.noun_synsets(w2)
    if not offs1 or not offs2:
        return 0.0
    best = 0.0
    for o1 in offs1:
        for o2 in offs2:
            if o1 == o2:
                return 1.0
            # depth maps: synset -> min node-count from root (root depth 1;
            # +1 for the virtual unified root over WordNet 3.0's multiple
            # noun roots, the WS4J/jawjaw convention)
            d1 = _min_depths(d, o1)
            d2 = _min_depths(d, o2)
            shared = set(d1) & set(d2)
            if not shared:
                continue
            for s in shared:
                dep_lcs = max(d1[s], d2[s])
                # node counts root->o1 through s: depth(s) + hops(s->o1)
                l1 = d1[s] + _hops(d, o1, s)
                l2 = d2[s] + _hops(d, o2, s)
                sim = 2.0 * dep_lcs / (l1 + l2)
                if sim > best:
                    best = sim
    return best


@lru_cache(maxsize=None)
def _min_depths_cached(d: WordNetDb, off: int) -> tuple[tuple[int, int], ...]:
    # keyed by the db INSTANCE (like _hops): a process that swaps
    # databases must not see depths computed from the previous dict
    depths: dict[int, int] = {}
    for path in d.root_paths(off):
        # path is synset-first, root-last; virtual root adds 1
        n = len(path) + 1
        for i, node in enumerate(path):
            nd = n - i
            if node not in depths or nd < depths[node]:
                depths[node] = nd
    return tuple(depths.items())


def _min_depths(d: WordNetDb, off: int) -> dict[int, int]:
    return dict(_min_depths_cached(d, off))


@lru_cache(maxsize=None)
def _hops(d: WordNetDb, off: int, anc: int) -> int:
    """Min hypernym hops from ``off`` up to ``anc`` (inf -> large)."""
    best = 10 ** 6
    for path in d.root_paths(off):
        if anc in path:
            best = min(best, path.index(anc))
    return best


def wup_distance(s1: str, s2: str) -> float:
    """1 - WUP for single noun words, identical-string short-circuit 0.0
    (WS4JWordNetDistanceMetric.computeDistanceSimpleWords)."""
    if s1.lower() == s2.lower():
        return 0.0
    return 1.0 - wup_similarity(s1, s2)


def ws4j_best_alignment(
    tokens1: list[str], tokens2: list[str]
) -> list[tuple[str, str, float]]:
    """WS4JWordNetDistanceMetric.computeBestAlignment: each token of the
    SMALLER set is greedily paired with its min-WUP-distance partner in
    the bigger set (first minimum wins ties, like Scala's minBy).
    Returned sorted by (source token) — the reference's groupBy/keys
    iteration order is unspecified, so the stable order is ours."""
    smaller, bigger = (
        (tokens1, tokens2) if len(tokens1) <= len(tokens2) else (tokens2, tokens1)
    )
    out = [
        min(((x, y, wup_distance(x, y)) for y in bigger), key=lambda t: t[2])
        for x in smaller
    ]
    return sorted(out)


def ws4j_name_distance(s1: str, s2: str) -> float:
    """WS4JWordNetDistanceMetric.computeDistance: tokenize both names
    (dictionary compound split, the reference's StringTokenizer), best-
    align the token sets, return the mean aligned WUP distance."""
    from serene_spark.functions.tokenize import tokenize_name

    alignment = ws4j_best_alignment(tokenize_name(s1), tokenize_name(s2))
    return sum(d for _, _, d in alignment) / len(alignment)
