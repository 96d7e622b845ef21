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
    "russian_light_stem",
    "italian_light_stem",
    "portuguese_light_stem",
    "dutch_snowball_stem",
    "swedish_light_stem",
    "norwegian_light_stem",
    "make_elision_filter",
    "cjk_width_fold",
    "CJKBigramFilter",
    "SpanishAnalyzer",
    "GermanAnalyzer",
    "FrenchAnalyzer",
    "RussianAnalyzer",
    "ItalianAnalyzer",
    "PortugueseAnalyzer",
    "DutchAnalyzer",
    "SwedishAnalyzer",
    "NorwegianAnalyzer",
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


# -- Russian ---------------------------------------------------------------

# suffix groups of Dolamic & Savoy's Russian light stemmer
# (``ru/RussianLightStemmer.java``: "Indexing and Searching Strategies
# for the Russian Language", implemented from the published rule list)
_RU_LEN6 = ("иями", "оями")
_RU_LEN5 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
    "ери", "ими", "ого", "ому", "ыми", "оев",
)
_RU_LEN4 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
    "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
    "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
)
_RU_SINGLE = frozenset("аеиоуйыяь")


def russian_light_stem(term: str) -> str:
    """``RussianLightStemmer.stem``: case-ending removal + ь/и/нн
    normalization."""
    s = term
    n = len(s)
    # removeCase: longest-first suffix groups, then single vowels
    if n > 6 and s.endswith(_RU_LEN6):
        s = s[:-4]
    elif n > 5 and s.endswith(_RU_LEN5):
        s = s[:-3]
    elif n > 4 and s.endswith(_RU_LEN4):
        s = s[:-2]
    elif n > 3 and s[-1] in _RU_SINGLE:
        s = s[:-1]
    # normalize
    if len(s) > 3:
        if s[-1] in "ьи":
            s = s[:-1]
        elif s[-1] == "н" and s[-2] == "н":
            s = s[:-1]
    return s


russian_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- Italian ---------------------------------------------------------------

_IT_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii"
)


def italian_light_stem(term: str) -> str:
    """``ItalianLightStemmer.stem`` (Savoy CLEF-2001): words shorter
    than 6 pass through; accent fold; final-vowel removal with the
    i/h digraph doubling rule."""
    if len(term) < 6:
        return term
    s = term.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


italian_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- Portuguese --------------------------------------------------------------

_PT_FOLD = str.maketrans(
    "àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic"
)


def _pt_remove_suffix(s: str) -> str:
    """``PortugueseLightStemmer.removeSuffix`` (Savoy UniNE): plural /
    adverb suffix rewrites, ordered longest-specific first."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    """``PortugueseLightStemmer.normFeminine``: -a feminine forms map
    to the masculine base."""
    n = len(s)
    if n > 7 and (
        s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")
    ):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(term: str) -> str:
    """``PortugueseLightStemmer.stem``: suffix removal → feminine
    normalization → final-vowel strip → accent fold (incl. ç → c)."""
    if len(term) < 4:
        return term
    s = _pt_remove_suffix(term)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_FOLD)


portuguese_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- Dutch (Snowball) --------------------------------------------------------

_NL_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
_NL_VOWELS = frozenset("aeiouyè")


def _nl_mark(word: str) -> list:
    """Snowball Dutch prelude: fold accents, then mark consonantal
    i/y as upper-case I/Y (initial y; y after a vowel; i between
    vowels)."""
    s = list(word.translate(_NL_FOLD))
    n = len(s)
    for k in range(n):
        c = s[k]
        if c == "y" and (k == 0 or s[k - 1] in _NL_VOWELS):
            s[k] = "Y"
        elif (
            c == "i"
            and 0 < k < n - 1
            and s[k - 1] in _NL_VOWELS
            and s[k + 1] in _NL_VOWELS
        ):
            s[k] = "I"
    return s


def _nl_regions(s: list):
    """Standard R1/R2 (first non-vowel after a vowel …), with the
    Dutch adjustment that R1 starts no earlier than position 3."""
    n = len(s)

    def after_vc(start: int) -> int:
        i = start
        while i < n and s[i] not in _NL_VOWELS:
            i += 1
        while i < n and s[i] in _NL_VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    if r1 < 3:
        r1 = 3
    return r1, r2


def _nl_undouble(s: list) -> list:
    if len(s) >= 2 and "".join(s[-2:]) in ("kk", "dd", "tt"):
        return s[:-1]
    return s


def _nl_valid_s_ending(s: list) -> bool:
    return len(s) > 0 and s[-1] not in _NL_VOWELS and s[-1] != "j"


def _nl_valid_en_ending(s: list) -> bool:
    return (
        len(s) > 0
        and s[-1] not in _NL_VOWELS
        and "".join(s[-3:]) != "gem"
    )


def dutch_snowball_stem(term: str) -> str:
    """Snowball Dutch stemmer (the ``nl/DutchAnalyzer.java:156``
    ``SnowballFilter(DutchStemmer)`` role), implemented from the
    published algorithm (snowballstem.org Dutch): prelude i/y marking,
    R1/R2 with the ≥3 adjustment, suffix steps 1–3b, vowel undoubling,
    postlude."""
    if not term:
        return term
    s = _nl_mark(term)
    r1, r2 = _nl_regions(s)

    def in_r1(suf_len: int) -> bool:
        return len(s) - suf_len >= r1

    def in_r2(suf_len: int) -> bool:
        return len(s) - suf_len >= r2

    w = lambda: "".join(s)

    # step 1 — longest matching of heden/ene/en/se/s
    if w().endswith("heden"):
        if in_r1(5):
            s = s[:-5] + list("heid")
    elif w().endswith("ene"):
        if in_r1(3) and _nl_valid_en_ending(s[:-3]):
            s = _nl_undouble(s[:-3])
    elif w().endswith("en"):
        if in_r1(2) and _nl_valid_en_ending(s[:-2]):
            s = _nl_undouble(s[:-2])
    elif w().endswith("se"):
        if in_r1(2) and _nl_valid_s_ending(s[:-2]):
            s = s[:-2]
    elif w().endswith("s"):
        if in_r1(1) and _nl_valid_s_ending(s[:-1]):
            s = s[:-1]

    # step 2 — delete final e if in R1 and preceded by a non-vowel
    e_found = False
    if (
        s
        and s[-1] == "e"
        and in_r1(1)
        and len(s) >= 2
        and s[-2] not in _NL_VOWELS
    ):
        e_found = True
        s = _nl_undouble(s[:-1])

    # step 3a — heid
    if w().endswith("heid") and in_r2(4) and (len(s) < 5 or s[-5] != "c"):
        s = s[:-4]
        if w().endswith("en") and in_r1(2) and _nl_valid_en_ending(s[:-2]):
            s = _nl_undouble(s[:-2])

    # step 3b — d-suffixes (longest matching)
    ww = w()
    if ww.endswith("end") or ww.endswith("ing"):
        if in_r2(3):
            s = s[:-3]
            if (
                "".join(s[-2:]) == "ig"
                and len(s) - 2 >= r2
                and (len(s) < 3 or s[-3] != "e")
            ):
                s = s[:-2]
            else:
                s = _nl_undouble(s)
    elif ww.endswith("ig"):
        if in_r2(2) and (len(s) < 3 or s[-3] != "e"):
            s = s[:-2]
    elif ww.endswith("lijk"):
        if in_r1(4):
            s = s[:-4]
            # then repeat step 2
            if (
                s
                and s[-1] == "e"
                and len(s) - 1 >= r1
                and len(s) >= 2
                and s[-2] not in _NL_VOWELS
            ):
                s = _nl_undouble(s[:-1])
    elif ww.endswith("baar"):
        if in_r1(4):
            s = s[:-4]
    elif ww.endswith("bar"):
        if in_r1(3) and e_found:
            s = s[:-3]

    # step 4 — undouble vowel: C V V D with D != I, V in aa/ee/oo/uu
    if len(s) >= 4:
        c, v1, v2, d = s[-4], s[-3], s[-2], s[-1]
        if (
            c not in _NL_VOWELS
            and d not in _NL_VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            s = s[:-2] + [d]

    # postlude
    return "".join(s).replace("I", "i").replace("Y", "y")


dutch_snowball_stem.pure_map = True  # type: ignore[attr-defined]


# -- Swedish -----------------------------------------------------------------

_SV_LEN4 = ("arne", "erna", "ande", "else", "aste", "orna", "aren")
_SV_LEN2 = ("ar", "er", "or", "en", "at", "te", "et")


def swedish_light_stem(term: str) -> str:
    """``SwedishLightStemmer.stem`` (Savoy, CLEF-2003 monolingual
    tracks): possessive -s then one suffix group, longest first."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s.endswith(_SV_LEN4):
        return s[:-4]
    if n > 5 and (
        s.endswith("are") or s.endswith("ast") or s.endswith("het")
    ):
        return s[:-3]
    if n > 4 and s.endswith(_SV_LEN2):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


swedish_light_stem.pure_map = True  # type: ignore[attr-defined]


# -- Norwegian (Bokmål) --------------------------------------------------------

_NO_LEN4 = ("ende", "else", "este", "eren")
_NO_LEN3 = ("ere", "est", "ene")
_NO_LEN2 = ("er", "en", "et", "st", "te")


def norwegian_light_stem(term: str) -> str:
    """``NorwegianLightStemmer.stem`` with the BOKMAAL flag (the
    ``no/NorwegianAnalyzer`` default register): possessive -s, then the
    Bokmål suffix groups, longest first."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("heter") or s.endswith("heten")):
        return s[:-5]
    if n > 5 and (s.endswith("dom") or s.endswith("het")):
        return s[:-3]
    if n > 7 and (s.endswith("elser") or s.endswith("elsen")):
        return s[:-5]
    if n > 6 and s.endswith(_NO_LEN4):
        return s[:-4]
    if n > 5 and s.endswith(_NO_LEN3):
        return s[:-3]
    if n > 4 and s.endswith(_NO_LEN2):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


norwegian_light_stem.pure_map = True  # type: ignore[attr-defined]


# ItalianAnalyzer.DEFAULT_ARTICLES (it/ItalianAnalyzer.java:48-54)
ITALIAN_ARTICLES = frozenset(
    ["c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
     "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
     "v", "d"]
)


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
RUSSIAN_STOP = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у
    же вы за бы по только ее мне было вот от меня еще нет о из ему
    теперь когда даже ну вдруг ли если уже или ни быть был него до вас
    нибудь опять уж вам ведь там потом себя ничего ей может они тут где
    есть надо ней для мы тебя их чем была сам чтоб без будто чего раз
    тоже себе под будет ж тогда кто этот"""
    .split()
)
ITALIAN_STOP = frozenset(
    """ad al allo ai agli all agl alla alle con col coi da dal dallo dai
    dagli dall dagl dalla dalle di del dello dei degli dell degl della
    delle in nel nello nei negli nell negl nella nelle su sul sullo sui
    sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi
    loro mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro
    nostra nostri nostre vostro vostra vostri vostre mi ti ci vi lo la
    li le gli ne il un uno una ma ed se perché anche come dov dove che
    chi cui non più quale quanto quanti quanta quante quello quelli
    quella quelle questo questi questa queste si tutto tutti a c e i l
    o ho hai ha abbiamo avete hanno è sono sei siamo siete sia"""
    .split()
)
PORTUGUESE_STOP = frozenset(
    """de a o que e do da em um para é com não uma os no se na por mais
    as dos como mas foi ao ele das tem à seu sua ou ser quando muito há
    nos já está eu também só pelo pela até isso ela entre era depois
    sem mesmo aos ter seus quem nas me esse eles estão você tinha foram
    essa num nem suas meu às minha têm numa pelos elas havia seja qual
    será nós tenho lhe deles essas esses pelas este fosse dele"""
    .split()
)
SWEDISH_STOP = frozenset(
    """och det att i en jag hon som han på den med var sig för så till
    är men ett om hade de av icke mig du henne då sin nu har inte hans
    honom skulle hennes där min man ej vid kunde något från ut när
    efter upp vi dem vad över än dig kan sina här ha mot alla under
    någon eller allt mycket"""
    .split()
)
NORWEGIAN_STOP = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke der
    så var meg seg men ett har om vi min mitt ha hadde hun nå over da
    ved fra du ut sin dem oss opp man kan hans hvor eller hva skal
    selv her alle vil bli ble"""
    .split()
)
DUTCH_STOP = frozenset(
    """de en van ik te dat die in een hij het niet zijn is was op aan
    met als voor had er maar om hem dan zou of wat mijn men dit zo door
    over ze zich bij ook tot je mij uit der daar haar naar heb hoe heeft
    hebben deze u want nog zal me zij nu ge geen omdat iets worden
    toch al waren veel meer doen toen moet ben zonder kan hun dus
    alles onder ja eens hier wie werd altijd doch wordt wezen kunnen
    ons zelf tegen na reeds wil kon niets uw iemand geweest andere"""
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


class RussianAnalyzer(Analyzer):
    """Russian chain: Standard → LowerCase → Stop → RussianLightStem —
    the ``ru/RussianLightStemFilterFactory`` configuration (the
    analyzer default in ``ru/RussianAnalyzer.java:109-115`` plugs the
    Snowball stemmer instead; the light stemmer is the UniNE variant
    this module standardizes on across languages)."""

    def __init__(self, stopwords=RUSSIAN_STOP, **kw):
        super().__init__(
            stopwords=stopwords, term_filters=(russian_light_stem,), **kw
        )


class ItalianAnalyzer(Analyzer):
    """``it/ItalianAnalyzer.java:123-130``: Standard → Elision(DEFAULT_
    ARTICLES) → LowerCase → Stop → ItalianLightStem."""

    def __init__(self, stopwords=ITALIAN_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            pre_stop_filters=(make_elision_filter(ITALIAN_ARTICLES),),
            term_filters=(italian_light_stem,),
            **kw,
        )


class PortugueseAnalyzer(Analyzer):
    """``pt/PortugueseAnalyzer.java:113-119``: Standard → LowerCase →
    Stop → PortugueseLightStem."""

    def __init__(self, stopwords=PORTUGUESE_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            term_filters=(portuguese_light_stem,),
            **kw,
        )


class DutchAnalyzer(Analyzer):
    """``nl/DutchAnalyzer.java:150-157``: Standard → LowerCase → Stop →
    Snowball(Dutch) (the default empty stem-override dict omitted)."""

    def __init__(self, stopwords=DUTCH_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            term_filters=(dutch_snowball_stem,),
            **kw,
        )


class SwedishAnalyzer(Analyzer):
    """Swedish chain: Standard → LowerCase → Stop → SwedishLightStem —
    the ``sv/SwedishLightStemFilterFactory`` configuration (the
    analyzer default plugs Snowball; this module standardizes on the
    published Savoy light stemmers)."""

    def __init__(self, stopwords=SWEDISH_STOP, **kw):
        super().__init__(
            stopwords=stopwords, term_filters=(swedish_light_stem,), **kw
        )


class NorwegianAnalyzer(Analyzer):
    """Norwegian (Bokmål) chain: Standard → LowerCase → Stop →
    NorwegianLightStem — the ``no/NorwegianLightStemFilterFactory``
    configuration, BOKMAAL flag."""

    def __init__(self, stopwords=NORWEGIAN_STOP, **kw):
        super().__init__(
            stopwords=stopwords,
            term_filters=(norwegian_light_stem,),
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
    "ru": RussianAnalyzer,
    "it": ItalianAnalyzer,
    "pt": PortugueseAnalyzer,
    "nl": DutchAnalyzer,
    "sv": SwedishAnalyzer,
    "no": NorwegianAnalyzer,
    "nb": NorwegianAnalyzer,
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
