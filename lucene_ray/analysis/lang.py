"""Non-English analysis chains — the ``analysis/common`` language
packages for the corpus's languages (fr, de, es, zh).

Reference semantics (all public UniNE / Savoy algorithms; implemented
from the algorithm, not transliterated):

- ``analysis/common/.../es/SpanishLightStemmer.java:63-117`` — Savoy's
  CLEF-2001 Spanish light stemmer.
- ``analysis/common/.../de/GermanLightStemmer.java:62-142`` — Savoy's
  UniNE German light stemmer (accent fold + 2 suffix steps).
- ``analysis/common/.../de/GermanNormalizationFilter.java:41-100`` —
  umlaut/ß normalization FSM ("ae" → "a" style folds with the V/U
  vowel-state guard).
- ``analysis/common/.../fr/FrenchLightStemmer.java:67-259`` — Savoy's
  UniNE French light stemmer (suffix rewrite table + norm()).
- ``analysis/common/.../util/ElisionFilter.java`` +
  ``fr/FrenchAnalyzer.java:76-84`` (DEFAULT_ARTICLES) — strip leading
  ``l'`` / ``qu'`` … articles before stopword filtering.
- ``analysis/common/.../cjk/CJKBigramFilter.java`` +
  ``cjk/CJKAnalyzer.java:92-99`` — Han/Hiragana unigram streams are
  re-emitted as overlapping bigrams; lone CJK chars stay unigrams;
  non-CJK tokens pass through.

Analyzer chains mirror the reference ``createComponents`` orders
(``FrenchAnalyzer.java:129-136``, ``GermanAnalyzer.java:127-134``,
``SpanishAnalyzer.java:113-119``, ``CJKAnalyzer.java:92-99``).  Stop
sets are scoped subsets of the reference's snowball lists (documented
per set); the registry accepts full custom sets.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

__all__ = [
    "spanish_light_stem",
    "german_normalize",
    "german_light_stem",
    "french_light_stem",
    "make_elision_filter",
    "cjk_width_fold",
    "CJKBigramFilter",
    "SpanishAnalyzer",
    "GermanAnalyzer",
    "FrenchAnalyzer",
    "CJKAnalyzer",
    "analyzer_for_lang",
]


# -- Spanish ---------------------------------------------------------------

_ES_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii"
)


def spanish_light_stem(term: str) -> str:
    """``SpanishLightStemmer.stem`` semantics."""
    if len(term) < 5:
        return term
    s = term.translate(_ES_FOLD)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s" and len(s) >= 4:
        if s[-4:-1] == "ese":
            return s[:-2]
        if s[-3:-1] == "ce":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


spanish_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- German ----------------------------------------------------------------


def german_normalize(term: str) -> str:
    """``GermanNormalizationFilter`` FSM: fold umlauts to base vowels,
    ß → ss, and delete the 'e' of 'ae'/'oe'/'ue' digraphs (the U-state
    transition) while protecting qu/iu/y contexts (the V state)."""
    N, V, U = 0, 1, 2
    state = N
    out: List[str] = []
    for ch in term:
        if ch in "ao":
            out.append(ch)
            state = U
        elif ch == "u":
            out.append(ch)
            state = U if state == N else V
        elif ch == "e":
            if state == U:
                state = V
                continue  # delete the digraph 'e'
            out.append(ch)
            state = V
        elif ch in "iqy":
            out.append(ch)
            state = V
        elif ch == "ä":
            out.append("a")
            state = V
        elif ch == "ö":
            out.append("o")
            state = V
        elif ch == "ü":
            out.append("u")
            state = V
        elif ch == "ß":
            out.append("ss")
            state = N
        else:
            out.append(ch)
            state = N
    return "".join(out)


german_normalize.pure_map = True  # type: ignore[attr-defined]

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST_END = frozenset("bdfghklmnt")


def german_light_stem(term: str) -> str:
    """``GermanLightStemmer.stem``: accent fold + two suffix steps."""
    s = term.translate(_DE_FOLD)
    # step 1
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and n >= 2 and s[-2] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _DE_ST_END:
        s = s[:-1]
    # step 2
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and (s.endswith("er") or s.endswith("en")):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _DE_ST_END:
        s = s[:-2]
    return s


german_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- French ----------------------------------------------------------------

_FR_NORM_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: List[str]) -> str:
    """``FrenchLightStemmer.norm``."""
    if len(s) > 4:
        s = list("".join(s).translate(_FR_NORM_FOLD))
        # squash consecutive identical letters
        out = [s[0]]
        for ch in s[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        s = out
    if len(s) > 4 and s[-2] == "i" and s[-1] == "e":
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return "".join(s)


def french_light_stem(term: str) -> str:
    """``FrenchLightStemmer.stem``: ordered suffix rewrite rules, each
    terminating into ``norm``."""
    s = list(term)

    def ends(suf: str) -> bool:
        return "".join(s).endswith(suf)

    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]
    if len(s) > 9 and ends("issement"):
        s = s[:-6]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("issant"):
        s = s[:-4]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("ement"):
        s = s[:-4]
        if len(s) > 3 and ends("ive"):
            s = s[:-1]
            s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 11 and ends("ficatrice"):
        s = s[:-5]
        s[-2], s[-1] = "e", "r"
        return _fr_norm(s)
    if len(s) > 10 and ends("ficateur"):
        s = s[:-4]
        s[-2], s[-1] = "e", "r"
        return _fr_norm(s)
    if len(s) > 9 and ends("catrice"):
        s = s[:-3]
        s[-4], s[-3], s[-2] = "q", "u", "e"
        return _fr_norm(s)
    if len(s) > 8 and ends("cateur"):
        s = s[:-2]
        s[-4], s[-3], s[-2], s[-1] = "q", "u", "e", "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("atrice"):
        s = s[:-4]
        s[-2], s[-1] = "e", "r"
        return _fr_norm(s)
    if len(s) > 7 and ends("ateur"):
        s = s[:-3]
        s[-2], s[-1] = "e", "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("trice"):
        s = s[:-1]
        s[-3], s[-2], s[-1] = "e", "u", "r"
    if len(s) > 5 and ends("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and ends("teuse"):
        s = s[:-2]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("teur"):
        s = s[:-1]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 5 and ends("euse"):
        return _fr_norm(s[:-2])
    if len(s) > 8 and ends("ère"):
        s = s[:-1]
        s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 7 and ends("ive"):
        s = s[:-1]
        s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 4 and (ends("folle") or ends("molle")):
        s = s[:-2]
        s[-1] = "u"
        return _fr_norm(s)
    if len(s) > 9 and ends("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and ends("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and ends("ète"):
        s = s[:-1]
        s[-2] = "e"
    if len(s) > 8 and ends("ique"):
        s = s[:-4]
    if len(s) > 8 and ends("esse"):
        return _fr_norm(s[:-3])
    if len(s) > 7 and ends("inage"):
        return _fr_norm(s[:-3])
    if len(s) > 9 and ends("isation"):
        s = s[:-7]
        if len(s) > 5 and ends("ual"):
            s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 9 and ends("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and ends("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and ends("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


french_light_stem.pure_map = True  # type: ignore[attr-defined]

# FrenchAnalyzer.DEFAULT_ARTICLES (fr/FrenchAnalyzer.java:76-84)
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"]
)

_APOS = ("'", "’")


def make_elision_filter(articles=FRENCH_ARTICLES):
    """``ElisionFilter`` role: strip a leading ``<article>'`` prefix.
    Runs pre-stop (pass via ``Analyzer(pre_stop_filters=...)``)."""

    def elide(term: str) -> str:
        for ap in _APOS:
            i = term.find(ap)
            if i >= 0:
                if term[:i] in articles:
                    return term[i + 1 :]
                return term
        return term

    elide.pure_map = True  # type: ignore[attr-defined]
    return elide


# -- CJK -------------------------------------------------------------------


def cjk_width_fold(term: str) -> str:
    """``CJKWidthFilter`` role, scoped to the fullwidth-ASCII fold
    (U+FF01–FF5E → U+0021–007E, U+3000 → space); the halfwidth-katakana
    composition half is out of scope for this corpus."""
    if not any("！" <= c <= "～" for c in term):
        return term
    return "".join(
        chr(ord(c) - 0xFEE0) if "！" <= c <= "～" else c
        for c in term
    )


cjk_width_fold.pure_map = True  # type: ignore[attr-defined]


def _is_cjk_unigram(t: str) -> bool:
    if len(t) != 1:
        return False
    o = ord(t)
    return (
        0x4E00 <= o <= 0x9FFF      # CJK Unified Ideographs
        or 0x3400 <= o <= 0x4DBF   # Extension A
        or 0xF900 <= o <= 0xFAFF   # Compatibility Ideographs
        or 0x3040 <= o <= 0x309F   # Hiragana
    )


class CJKBigramFilter:
    """Stream-level filter (``Analyzer.graph_filters`` protocol):
    consecutive-position CJK unigrams (Han / Hiragana — the types the
    tokenizer emits per-char) become overlapping bigrams; a lone CJK
    char survives as a unigram; everything else passes through.
    ``CJKBigramFilter.java`` default-flags semantics."""

    def apply(
        self,
        terms: Sequence[str],
        positions: Optional[Sequence[int]],
        offsets: Optional[Sequence[Tuple[int, int]]] = None,
    ):
        n = len(terms)
        pos = list(positions) if positions is not None else list(range(n))
        out_t: List[str] = []
        out_p: List[int] = []
        out_o: List[Tuple[int, int]] = []
        i = 0
        while i < n:
            if not _is_cjk_unigram(terms[i]):
                out_t.append(terms[i])
                out_p.append(pos[i])
                if offsets is not None:
                    out_o.append(offsets[i])
                i += 1
                continue
            j = i
            while (
                j + 1 < n
                and _is_cjk_unigram(terms[j + 1])
                and pos[j + 1] == pos[j] + 1
            ):
                j += 1
            if j == i:  # lone CJK char → unigram
                out_t.append(terms[i])
                out_p.append(pos[i])
                if offsets is not None:
                    out_o.append(offsets[i])
            else:
                for k in range(i, j):
                    out_t.append(terms[k] + terms[k + 1])
                    out_p.append(pos[k])
                    if offsets is not None:
                        out_o.append((offsets[k][0], offsets[k + 1][1]))
            i = j + 1
        if offsets is not None:
            return out_t, out_p, out_o
        return out_t, out_p


# -- Analyzers -------------------------------------------------------------

from lucene_ray.analysis.analyzer import (  # noqa: E402
    Analyzer,
    EnglishAnalyzer,
    StandardAnalyzer,
)

# Scoped subsets of the reference snowball stop lists (most-frequent
# function words; full lists pluggable via the stopwords argument).
SPANISH_STOP = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo
    como mas pero sus le ya o este si porque esta entre cuando muy sin
    sobre tambien me hasta hay donde quien desde todo nos durante todos
    uno les ni contra otros ese eso ante ellos e esto mi antes algunos
    unos yo otro otras otra tanto esa estos mucho es son fue era"""
    .split()
)
GERMAN_STOP = frozenset(
    """der die das und oder aber ein eine einer eines einem einen dem den
    des im in auf mit für von zu ist sind war waren wird werden nicht
    auch als an bei nach aus um so wenn dann noch nur wie es ich du er
    sie wir ihr man sich dass kein können muss"""
    .split()
)
FRENCH_STOP = frozenset(
    """le la les de des du un une et en au aux ce ces dans est il elle
    ils elles je tu nous vous que qui ne pas pour par sur se sa son ses
    mais ou où donc or ni car à été être avoir fait plus sont avec tout
    cette comme"""
    .split()
)
# CJKAnalyzer ships an English stop list (stopwords file in cjk/);
# bigram tokens never collide with it, single English words do.
CJK_STOP = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with"""
    .split()
)


class SpanishAnalyzer(Analyzer):
    """``es/SpanishAnalyzer.java:113-119``: Standard → LowerCase → Stop
    → SpanishLightStem."""

    def __init__(self, stopwords=SPANISH_STOP, **kw):
        super().__init__(
            stopwords=stopwords, term_filters=(spanish_light_stem,), **kw
        )


class GermanAnalyzer(Analyzer):
    """``de/GermanAnalyzer.java:127-134``: Standard → LowerCase → Stop
    → GermanNormalization → GermanLightStem."""

    def __init__(self, stopwords=GERMAN_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            term_filters=(german_normalize, german_light_stem),
            **kw,
        )


class FrenchAnalyzer(Analyzer):
    """``fr/FrenchAnalyzer.java:129-136``: Standard → Elision →
    LowerCase → Stop → FrenchLightStem."""

    def __init__(self, stopwords=FRENCH_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            pre_stop_filters=(make_elision_filter(),),
            term_filters=(french_light_stem,),
            **kw,
        )


class CJKAnalyzer(Analyzer):
    """``cjk/CJKAnalyzer.java:92-99``: Standard → CJKWidth → LowerCase
    → CJKBigram → Stop (stop list is English words, so filtering before
    bigrams — this chain's order — is output-equivalent)."""

    def __init__(self, stopwords=CJK_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            pre_stop_filters=(cjk_width_fold,),
            graph_filters=(CJKBigramFilter(),),
            **kw,
        )


_LANG_REGISTRY = {
    "es": SpanishAnalyzer,
    "de": GermanAnalyzer,
    "fr": FrenchAnalyzer,
    "zh": CJKAnalyzer,
    "ja": CJKAnalyzer,
    "ko": CJKAnalyzer,
}


def analyzer_for_lang(lang: str) -> Analyzer:
    """Language → analyzer instance; ``en`` → ``EnglishAnalyzer``,
    unknown → ``StandardAnalyzer`` defaults (empty stop set)."""
    if lang == "en":
        return EnglishAnalyzer()
    cls = _LANG_REGISTRY.get(lang)
    return cls() if cls is not None else StandardAnalyzer()
