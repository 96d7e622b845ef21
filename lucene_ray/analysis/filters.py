"""analysis-common token filters (clean-room).

The reference ships ~123 token filters in ``lucene/analysis/common``;
this module implements the handful a webtext pipeline actually reaches
for, as composable per-term callables resolved BY NAME through a tiny
SPI-style registry (the ``TokenFilterFactory`` role,
``lucene/analysis/common/src/java/org/apache/lucene/analysis/util/
TokenFilterFactory.java``), so an ``IndexConfig`` stays picklable/JSON.

- ``porter_stem`` — clean-room implementation of the published Porter
  algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
  14(3) 1980; the same public spec behind the reference's
  ``PorterStemmer.java``).
- ``ascii_fold`` — ``ASCIIFoldingFilter`` role: NFKD-decompose and drop
  combining marks, plus the Latin special cases NFKD can't reach
  (æ ø ß …).
- ``english_possessive`` — ``EnglishPossessiveFilter`` role: strip a
  trailing ``'s`` (ASCII/typographic/fullwidth apostrophes).
- ``length(lo, hi)`` — ``LengthFilter`` role: DROP terms outside the
  byte-length band (drops create position gaps, like StopFilter).
- ``shingles`` — ``ShingleFilter`` role as a standalone n-gram helper
  (used by dedup/fingerprint pipelines rather than the inverted chain).

Filter protocol: ``f(term) -> term | None`` (None = drop the token and
leave a position gap). Pure term→term rewrites carry ``pure_map=True``;
the analyzer exploits that to apply them ONCE PER DISTINCT TERM via
dictionary encoding on the batched hot path (vocabulary-level stemming —
the flat token stream is remapped with one Arrow ``take``).
"""

from __future__ import annotations

import unicodedata
from typing import Callable, List, Optional, Sequence, Tuple

TermFilter = Callable[[str], Optional[str]]

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V] — the number of vowel→consonant transitions
    after the optional leading consonant run."""
    n = 0
    i = 0
    L = len(w)
    while i < L and _is_cons(w, i):
        i += 1
    while i < L:
        while i < L and not _is_cons(w, i):
            i += 1
        if i >= L:
            break
        n += 1
        while i < L and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends consonant-vowel-consonant, final consonant not w/x/y."""
    return (
        len(w) >= 3
        and _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _longest_rule(w: str, rules: Sequence[Tuple[str, str]]):
    """Longest matching suffix in the rule list (Porter semantics: the
    longest match is selected FIRST, then its condition is tested — a
    failed condition does not fall through to shorter suffixes)."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
    ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""), ("ment", ""),
    ("ent", ""), ("ion", ""), ("ou", ""), ("ism", ""), ("ate", ""),
    ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
)


def porter_stem(word: str) -> str:
    """Porter 1980, steps 1a-5b. Words of length ≤ 2 or containing
    non-ASCII-letters pass through unchanged (the reference stems only
    plain letter runs the same way)."""
    w = word
    if len(w) <= 2 or not w.isascii() or not w.isalpha():
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        applied = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            applied = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            applied = True
        if applied:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    r = _longest_rule(w, _STEP2)
    if r and _measure(w[: -len(r[0])]) > 0:
        w = w[: -len(r[0])] + r[1]

    # step 3
    r = _longest_rule(w, _STEP3)
    if r and _measure(w[: -len(r[0])]) > 0:
        w = w[: -len(r[0])] + r[1]

    # step 4
    r = _longest_rule(w, _STEP4)
    if r:
        stem = w[: -len(r[0])]
        ok = _measure(stem) > 1
        if ok and r[0] == "ion":
            ok = stem.endswith(("s", "t"))
        if ok:
            w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


porter_stem.pure_map = True  # type: ignore[attr-defined]


_FOLD_SPECIALS = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "þ": "th", "Þ": "TH",
    "ð": "d", "Ð": "D", "ł": "l", "Ł": "L", "ı": "i",
}


def ascii_fold(term: str) -> str:
    """``ASCIIFoldingFilter`` role: NFKD-decompose, drop combining marks,
    apply the Latin special cases decomposition can't produce. Terms that
    are already ASCII return unchanged (zero-cost common case)."""
    if term.isascii():
        return term
    out = []
    for ch in term:
        if ch.isascii():
            out.append(ch)
            continue
        sp = _FOLD_SPECIALS.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        for d in unicodedata.normalize("NFKD", ch):
            if not unicodedata.combining(d) and d.isascii():
                out.append(d)
    return "".join(out) or term


ascii_fold.pure_map = True  # type: ignore[attr-defined]


_APOSTROPHES = ("'s", "’s", "＇s")


def english_possessive(term: str) -> str:
    """``EnglishPossessiveFilter`` role: strip one trailing ``'s``."""
    for suf in _APOSTROPHES:
        if term.endswith(suf):
            return term[:-2]
    return term


english_possessive.pure_map = True  # type: ignore[attr-defined]


def make_truncate_filter(n: int) -> TermFilter:
    """``TruncateTokenFilter`` role (codepoint mode,
    ``miscellaneous/TruncateTokenFilter.java``): fixed prefix of ``n``
    codepoints — F5 prefix truncation is a published stemming method
    for Turkish."""
    if n < 1:
        raise ValueError("truncate length must be >= 1")

    def truncate(term: str) -> str:
        return term[:n]

    truncate.pure_map = True  # type: ignore[attr-defined]
    return truncate


def reverse_token(term: str) -> str:
    """``ReverseStringFilter`` role (``reverse/ReverseStringFilter.java``):
    codepoint-order reversal (the reference keeps surrogate pairs
    intact, which Python's codepoint slicing does by construction);
    classic trick enabling leading-wildcard queries on a reversed
    field."""
    return term[::-1]


reverse_token.pure_map = True  # type: ignore[attr-defined]


def decimal_digit(term: str) -> str:
    """``DecimalDigitFilter`` role (``core/DecimalDigitFilter.java``):
    fold non-Latin decimal digits (Unicode Nd outside ASCII) to their
    0-9 equivalents."""
    if term.isascii():
        return term
    import unicodedata

    out = []
    for ch in term:
        if ord(ch) > 0x7F:
            d = unicodedata.decimal(ch, None)
            if d is not None:
                out.append(chr(ord("0") + d))
                continue
        out.append(ch)
    return "".join(out)


decimal_digit.pure_map = True  # type: ignore[attr-defined]


def apostrophe_filter(term: str) -> str:
    """``tr/ApostropheFilter.java``: keep only the part before the
    first apostrophe (Turkish possessive suffixes)."""
    for i, ch in enumerate(term):
        if ch == "'" or ch == "’":
            return term[:i]
    return term


apostrophe_filter.pure_map = True  # type: ignore[attr-defined]


def make_length_filter(lo: int, hi: int) -> TermFilter:
    """``LengthFilter`` role: keep terms with lo ≤ len ≤ hi; drops leave
    position gaps (FilteringTokenFilter semantics)."""

    def length_filter(term: str) -> Optional[str]:
        return term if lo <= len(term) <= hi else None

    length_filter.pure_map = False  # type: ignore[attr-defined]
    return length_filter


def shingles(terms: Sequence[str], n: int, sep: str = " ") -> List[str]:
    """``ShingleFilter`` role (output_unigrams=False): contiguous word
    n-grams joined by ``sep``."""
    if n <= 1:
        return list(terms)
    return [sep.join(terms[i : i + n]) for i in range(len(terms) - n + 1)]


def resolve_filters(names: Sequence[str]) -> Tuple[TermFilter, ...]:
    """Registry lookup: name → callable. Parameterized filters encode
    their arguments in the name (``length:2:255``)."""
    out: List[TermFilter] = []
    for name in names:
        if name == "porterstem":
            out.append(porter_stem)
        elif name == "asciifolding":
            out.append(ascii_fold)
        elif name == "englishpossessive":
            out.append(english_possessive)
        elif name.startswith("length:"):
            _, lo, hi = name.split(":")
            out.append(make_length_filter(int(lo), int(hi)))
        elif name.startswith("truncate:"):
            out.append(make_truncate_filter(int(name.split(":")[1])))
        elif name == "reverse":
            out.append(reverse_token)
        elif name == "decimaldigit":
            out.append(decimal_digit)
        elif name == "apostrophe":
            out.append(apostrophe_filter)
        elif name in _LANG_STEM_NAMES:
            # language stems live in analysis/lang.py (imported lazily:
            # lang.py imports the Analyzer, which resolves filters here)
            from lucene_ray.analysis import lang as _lang

            out.append(getattr(_lang, _LANG_STEM_NAMES[name]))
        else:
            raise ValueError(f"unknown token filter: {name!r}")
    return tuple(out)


# registry names for the per-language stem/normalization maps (the
# TokenFilterFactory SPI names, lower-cased like the reference's)
_LANG_STEM_NAMES = {
    "frenchlightstem": "french_light_stem",
    "germanlightstem": "german_light_stem",
    "germannormalization": "german_normalize",
    "spanishlightstem": "spanish_light_stem",
    "russianlightstem": "russian_light_stem",
    "italianlightstem": "italian_light_stem",
    "portugueselightstem": "portuguese_light_stem",
    "dutchstem": "dutch_snowball_stem",
    "swedishlightstem": "swedish_light_stem",
    "norwegianlightstem": "norwegian_light_stem",
}


class NGramGraphFilter:
    """``NGramTokenFilter`` role (``analysis/common/.../ngram/
    NGramTokenFilter.java:98-140``): every codepoint n-gram of each
    token, ``min_gram <= n <= max_gram``, emitted at the TOKEN's
    position (pos ascending, gram size ascending within pos — the
    reference loop order); ``preserve_original`` keeps tokens outside
    the gram-length window. Stream-level (``Analyzer.graph_filters``
    protocol) because output token count grows."""

    def __init__(self, min_gram: int, max_gram: int,
                 preserve_original: bool = False, edge: bool = False):
        if min_gram < 1 or min_gram > max_gram:
            raise ValueError("bad n-gram bounds")
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.preserve_original = preserve_original
        self.edge = edge

    def _grams(self, t: str):
        n = len(t)
        if self.preserve_original and n < self.min_gram:
            yield t
            return
        starts = (0,) if self.edge else range(n)
        for p in starts:
            for g in range(self.min_gram, self.max_gram + 1):
                if p + g > n:
                    break
                yield t[p : p + g]
        if self.preserve_original and n > self.max_gram:
            # original longer than max_gram: keep it after its grams
            yield t

    def apply(self, terms, positions, offsets=None):
        pos = list(positions) if positions is not None else list(range(len(terms)))
        out_t, out_p, out_o = [], [], []
        for i, t in enumerate(terms):
            for g in self._grams(t):
                out_t.append(g)
                out_p.append(pos[i])
                if offsets is not None:
                    out_o.append(offsets[i])  # original offsets, like the reference
        if offsets is not None:
            return out_t, out_p, out_o
        return out_t, out_p


def edge_ngram_filter(min_gram: int, max_gram: int,
                      preserve_original: bool = False) -> NGramGraphFilter:
    """``EdgeNGramTokenFilter`` role: leading-edge grams only."""
    return NGramGraphFilter(min_gram, max_gram, preserve_original, edge=True)
