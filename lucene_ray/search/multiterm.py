"""MultiTermQuery expansion helpers: wildcard pattern compilation and
Damerau-Levenshtein edit distance.

The reference expands multi-term queries by intersecting a compiled
automaton with the block-tree term dictionary
(``core/search/AutomatonQuery.java``, blocktree ``IntersectTermsEnum.java``);
this engine scans the sorted dictionary range bounded by the pattern's
literal head and applies the predicate per term — same result set,
simpler machinery (SURVEY §2.12 "term-dict scan + disjunction").
"""

from __future__ import annotations

import re
from typing import Optional


def wildcard_regex(pattern: str) -> "re.Pattern[str]":
    """``*`` → any run, ``?`` → exactly one char; everything else literal
    (``core/search/WildcardQuery.java:28-40`` syntax)."""
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return re.compile("".join(parts), re.DOTALL)


def wildcard_literal_head(pattern: str) -> str:
    """Literal prefix before the first wildcard — bounds the dict scan."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


_REGEX_META = set(".?*+()[]{}|\\^$")


def regexp_literal_head(pattern: str) -> str:
    """Literal prefix of a regexp before its first metacharacter — the
    common-prefix extraction the reference gets from its compiled
    automaton (``core/search/RegexpQuery.java`` →
    ``AutomatonQuery.java``); bounds the dictionary scan range."""
    out = []
    for i, ch in enumerate(pattern):
        if ch in _REGEX_META:
            # a quantifier after a literal makes THAT char optional/
            # repeated — it is not part of the guaranteed prefix
            if ch in "?*{" and out:
                out.pop()
            break
        out.append(ch)
    return "".join(out)


def damerau_levenshtein(a: str, b: str, cap: Optional[int] = None) -> int:
    """FULL Damerau-Levenshtein distance (unrestricted transpositions —
    ``damerau_levenshtein('ca','abc') == 2``), the same definition DuckDB
    implements, so fuzzy oracles are expressible exactly. The reference's
    fuzzy automata use optimal string alignment, which differs only when
    a transposition is itself later edited (documented in
    ``search.query.FuzzyQuery``). ``cap`` short-circuits to ``cap + 1``
    when the length difference alone exceeds it."""
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    # charset → last row where the char occurred in `a`
    da = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = inf
    for i in range(la + 1):
        d[i + 1][0] = inf
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = inf
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein (``transpositions=False`` fuzzy path)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ai != b[j - 1]),
            )
        prev = cur
    return prev[lb]
