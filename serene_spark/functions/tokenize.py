"""Column-name tokenizer (SURVEY §2.7).

Reference: ``StringTokenizer`` splits camelCase, then non-alphanumerics,
lowercases, and finally applies dictionary-based minimum-cut compound-word
splitting with memoized recursion over an english wordlist
(matcher/.../nlptools/tokenizer/StringTokenizer.scala:35-78; memoization
util/Memoized.scala:16).

Driver-side by design (SURVEY §2.7): tokenization applies to column-HEADER
metadata — O(#columns) strings — never to row data, so pure Python with
``functools.lru_cache`` is the right altitude; no Spark job is involved.
The wordlist is a compact built-in set (the reference ships an infochimps
wordlist resource; any dictionary slots in via the ``words`` parameter).
"""

from __future__ import annotations

import re
from functools import lru_cache

# Compact default dictionary biased to schema vocabulary. A caller with a
# full wordlist passes it via ``set_dictionary``.
_DEFAULT_WORDS = frozenset(
    """
    account acct bal balance birth city class client code comment cost count
    country
    cust customer date day district email extended fax first flag gender home
    id item key last line loc local location mail mkt market mode name nation
    number order part person phone post postal price priority quantity region
    retail seg segment ship size state status street supp supplier tax tel
    telephone time total type unit user year zip
    """.split()
)

_dictionary: frozenset[str] = _DEFAULT_WORDS


def set_dictionary(words: frozenset[str]) -> None:
    global _dictionary
    _dictionary = words
    _min_cut_split.cache_clear()


def tokenize_name(name: str) -> list[str]:
    """camelCase split → non-alphanumeric split → lowercase → compound split."""
    camel = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", name)
    parts = [p.lower() for p in re.split(r"[^A-Za-z0-9]+", camel) if p]
    out: list[str] = []
    for p in parts:
        out.extend(_min_cut_split(p))
    return out


@lru_cache(maxsize=4096)
def _min_cut_split(word: str) -> tuple[str, ...]:
    """Minimum-cut compound splitting: fewest segments such that every
    segment is a dictionary word; unknown words stay whole (the reference's
    fallback when no full-dictionary cover exists)."""
    if not word or word in _dictionary or word.isdigit():
        return (word,) if word else ()
    best: tuple[str, ...] | None = None
    for i in range(1, len(word)):
        head, tail = word[:i], word[i:]
        if head not in _dictionary:
            continue
        rest = _min_cut_split(tail)
        if all(seg in _dictionary or seg.isdigit() for seg in rest):
            cand = (head,) + rest
            if best is None or len(cand) < len(best):
                best = cand
    return best if best is not None else (word,)
