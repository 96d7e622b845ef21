"""analysis-common token filters: Porter stemmer goldens, folding,
possessive, length, shingles, analyzer-chain integration."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.analyzer import Analyzer, EnglishAnalyzer
from lucene_ray.analysis.filters import (
    ascii_fold,
    english_possessive,
    make_length_filter,
    porter_stem,
    resolve_filters,
    shingles,
)

# canonical full-algorithm outputs (Porter 1980, public sample vocabulary)
PORTER_GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "controlling": "control",
    "generalization": "gener", "oscillators": "oscil", "abatements": "abat",
    "abilities": "abil", "ability": "abil", "absorbent": "absorb",
    "accompaniment": "accompani", "argument": "argument",
    "arguments": "argument", "probate": "probat", "rate": "rate",
    "roll": "roll", "controll": "control", "adoption": "adopt",
    "replacement": "replac", "dependent": "depend", "effective": "effect",
}


def test_porter_golden():
    for w, want in PORTER_GOLDEN.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_and_nonalpha_passthrough():
    assert porter_stem("as") == "as"
    assert porter_stem("a1b2") == "a1b2"
    assert porter_stem("café") == "café"


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("Übergrößen") == "Ubergrossen"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("plain") == "plain"


def test_english_possessive():
    assert english_possessive("john's") == "john"
    assert english_possessive("john’s") == "john"
    assert english_possessive("its") == "its"


def test_length_filter_drops():
    f = make_length_filter(2, 4)
    assert f("ok") == "ok" and f("four") == "four"
    assert f("x") is None and f("toolong") is None


def test_shingles():
    assert shingles(["a", "b", "c"], 2) == ["a b", "b c"]
    assert shingles(["a"], 2) == []
    assert shingles(["a", "b"], 1) == ["a", "b"]


def test_registry_roundtrip():
    fs = resolve_filters(("porterstem", "asciifolding", "length:2:255"))
    assert fs[0]("running") == "run"
    with pytest.raises(ValueError):
        resolve_filters(("nosuchfilter",))


def test_analyzer_map_chain_positions_dense():
    a = Analyzer(term_filters=resolve_filters(("porterstem",)))
    terms, positions = a.analyze_fast("running dogs quickly")
    assert terms == ["run", "dog", "quickli"]
    assert positions is None


def test_analyzer_dropping_filter_leaves_gaps():
    a = Analyzer(term_filters=resolve_filters(("length:3:255",)))
    terms, positions = a.analyze_fast("an ox ran far")
    assert terms == ["ran", "far"]
    assert positions == [2, 3]


def test_analyze_flat_matches_per_doc_path():
    """The vocabulary-level dictionary-encode remap must equal the
    per-document chain on both ASCII and mixed batches."""
    a = Analyzer(term_filters=resolve_filters(("englishpossessive", "porterstem")))
    texts = [
        "the owner's dogs were running",
        "carried caring cars",
        "",
        "café's naïve résumés",  # non-ASCII docs take the interleave path
        "plastered agreed feed",
    ]
    flat_terms, lengths, positions = a.analyze_flat(texts)
    assert positions is None
    got = (
        flat_terms.to_pylist()
        if isinstance(flat_terms, pa.Array)
        else list(flat_terms)
    )
    want = []
    want_lengths = []
    for t in texts:
        terms, _ = a.analyze_fast(t)
        want.extend(terms)
        want_lengths.append(len(terms))
    assert got == want
    assert list(lengths) == want_lengths


def test_english_analyzer_chain():
    a = EnglishAnalyzer()
    terms, positions = a.analyze_fast("The owner's dogs are running")
    # 'the'/'are' stopped (gaps), possessive stripped, stems applied
    assert terms == ["owner", "dog", "run"]
    assert positions == [1, 2, 4]


class TestNGramGraphFilters:
    # ngram/NGramTokenFilter.java:98-140 + EdgeNGramTokenFilter.java
    def test_ngram_order_and_positions(self):
        from lucene_ray.analysis.filters import NGramGraphFilter

        t, p = NGramGraphFilter(2, 3).apply(["abcd", "xy"], [0, 2])
        assert t == ["ab", "abc", "bc", "bcd", "cd", "xy"]
        assert p == [0, 0, 0, 0, 0, 2]  # grams keep the token's position

    def test_edge_ngram(self):
        from lucene_ray.analysis.filters import edge_ngram_filter

        t, _ = edge_ngram_filter(2, 4).apply(["search"], None)
        assert t == ["se", "sea", "sear"]

    def test_preserve_original(self):
        from lucene_ray.analysis.filters import edge_ngram_filter

        t, _ = edge_ngram_filter(2, 4, preserve_original=True).apply(
            ["a", "searching", "se"], None
        )
        assert t == ["a", "se", "sea", "sear", "searching", "se"]

    def test_in_analyzer_chain(self):
        from lucene_ray.analysis.analyzer import Analyzer
        from lucene_ray.analysis.filters import edge_ngram_filter

        an = Analyzer(graph_filters=(edge_ngram_filter(2, 3),))
        terms, pos = an.analyze_fast("Hello data")
        assert terms == ["he", "hel", "da", "dat"]
        assert pos == [0, 0, 1, 1]

    def test_offsets_are_original(self):
        from lucene_ray.analysis.analyzer import Analyzer
        from lucene_ray.analysis.filters import edge_ngram_filter

        an = Analyzer(graph_filters=(edge_ngram_filter(2, 2),))
        out = an.analyze("abc def")
        assert [(o[0], o[1], o[2]) for o in out] == [
            ("ab", 0, 3),
            ("de", 4, 7),
        ]


class TestRound5Filters:
    def test_truncate_codepoints(self):
        from lucene_ray.analysis.filters import resolve_filters

        (f,) = resolve_filters(("truncate:5",))
        assert f("istanbullu") == "istan"
        assert f("ab") == "ab"
        assert f("𝒜𝒷𝒸𝒹ℯ𝒻") == "𝒜𝒷𝒸𝒹ℯ"  # codepoints, not UTF-16 units

    def test_reverse(self):
        from lucene_ray.analysis.filters import resolve_filters

        (f,) = resolve_filters(("reverse",))
        assert f("abc") == "cba"
        assert f("a𝒜b") == "b𝒜a"  # surrogate pair survives

    def test_decimal_digit(self):
        from lucene_ray.analysis.filters import resolve_filters

        (f,) = resolve_filters(("decimaldigit",))
        assert f("٢٠٢٤") == "2024"      # Arabic-Indic
        assert f("१२३") == "123"        # Devanagari
        assert f("a٥b5") == "a5b5"
        assert f("plain7") == "plain7"
        assert f("Ⅻ") == "Ⅻ"           # Roman numeral: No/Nl, not Nd

    def test_apostrophe(self):
        from lucene_ray.analysis.filters import resolve_filters

        (f,) = resolve_filters(("apostrophe",))
        assert f("türkiye'nin") == "türkiye"
        assert f("o’clock") == "o"
        assert f("plain") == "plain"

    def test_bad_truncate(self):
        import pytest

        from lucene_ray.analysis.filters import resolve_filters

        with pytest.raises(ValueError):
            resolve_filters(("truncate:0",))
