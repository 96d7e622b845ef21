"""Non-English analysis chains: Savoy light stemmers, German
normalization, French elision, CJK bigrams, language routing, and the
frozen gate goldens (pipelines/lang_analysis)."""
import numpy as np
import pytest

from lucene_ray.analysis.lang import (
    CJKAnalyzer,
    CJKBigramFilter,
    FrenchAnalyzer,
    GermanAnalyzer,
    SpanishAnalyzer,
    analyzer_for_lang,
    cjk_width_fold,
    french_light_stem,
    german_light_stem,
    german_normalize,
    make_elision_filter,
    spanish_light_stem,
)


class TestSpanishLightStem:
    # Savoy CLEF-2001 semantics (es/SpanishLightStemmer.java:63-117)
    @pytest.mark.parametrize(
        "word,stem",
        [
            ("libro", "libr"),
            ("libros", "libr"),
            ("casa", "casa"),  # len < 5 untouched
            ("canciones", "cancion"),
            ("veces", "vez"),  # ces → z
            ("intereses", "interes"),  # eses → es... -2
            ("rápidos", "rapid"),  # accent fold + os
            ("española", "español"),
            ("azul", "azul"),
        ],
    )
    def test_goldens(self, word, stem):
        assert spanish_light_stem(word) == stem


class TestGermanChain:
    @pytest.mark.parametrize(
        "word,norm",
        [
            ("straße", "strasse"),
            ("haeuser", "hauser"),  # ae digraph e-deletion (U state)
            ("über", "uber"),
            ("quelle", "quelle"),  # q guards the u (V state)
            ("bauer", "bauer"),  # au then e: state V keeps the e
        ],
    )
    def test_normalization(self, word, norm):
        assert german_normalize(word) == norm

    @pytest.mark.parametrize(
        "word,stem",
        [
            ("hauser", "haus"),
            ("kindern", "kind"),
            ("schonen", "schon"),
            ("schonste", "schon"),  # -e, then step2 st-drop (n ∈ stEnding)
            ("tages", "tag"),
            ("haus", "haus"),
        ],
    )
    def test_light_stem(self, word, stem):
        assert german_light_stem(word) == stem

    def test_analyzer_chain(self):
        terms, pos = GermanAnalyzer().analyze_fast(
            "Die Häuser und die schönen Gärten"
        )
        assert terms == ["haus", "schon", "gart"]
        assert pos == [1, 4, 5]  # stop gaps preserved


class TestFrenchChain:
    @pytest.mark.parametrize(
        "word,stem",
        [
            ("chevaux", "cheval"),  # aux → al
            ("nationaux", "national"),
            ("administration", "administ"),
            ("heureuse", "heureu"),
            ("avion", "avion"),
            ("informatique", "informat"),  # ique removal
        ],
    )
    def test_light_stem(self, word, stem):
        assert french_light_stem(word) == stem

    def test_elision_runs_before_stop(self):
        # "l'est" must elide to "est" and then be stop-dropped — the
        # reference chain order (Elision → LowerCase → Stop → Stem)
        terms, _ = FrenchAnalyzer().analyze_fast("l'est l'avion")
        assert terms == ["avion"]

    def test_elision_articles(self):
        elide = make_elision_filter()
        assert elide("l'avion") == "avion"
        assert elide("qu'il") == "il"
        assert elide("jusqu'au") == "au"
        assert elide("x'avion") == "x'avion"  # not an article
        assert elide("avion") == "avion"


class TestCJK:
    def test_width_fold(self):
        assert cjk_width_fold("ｔｅｓｔ１２３") == "test123"
        assert cjk_width_fold("plain") == "plain"

    def test_bigrams_within_run(self):
        t, p = CJKBigramFilter().apply(list("数据库系统"), None)
        assert t == ["数据", "据库", "库系", "系统"]
        assert p == [0, 1, 2, 3]

    def test_lone_char_stays_unigram(self):
        t, p = CJKBigramFilter().apply(["alpha", "中", "beta"], None)
        assert t == ["alpha", "中", "beta"]
        assert p == [0, 1, 2]

    def test_no_bigram_across_position_gap(self):
        # non-consecutive positions (e.g. a stop-dropped token between)
        t, p = CJKBigramFilter().apply(["中", "文"], [0, 2])
        assert t == ["中", "文"]
        assert p == [0, 2]

    def test_analyzer_offsets(self):
        out = CJKAnalyzer().analyze("数据库")
        assert [(o[0], o[1], o[2]) for o in out] == [
            ("数据", 0, 2),
            ("据库", 1, 3),
        ]

    def test_separator_breaks_adjacency(self):
        # the gate pipeline's digit separator keeps per-word goldens valid
        t, _ = CJKAnalyzer().analyze_fast("数据 7 系统")
        assert t == ["数据", "7", "系统"]


class TestRouting:
    def test_lang_registry(self):
        assert isinstance(analyzer_for_lang("es"), SpanishAnalyzer)
        assert isinstance(analyzer_for_lang("zh"), CJKAnalyzer)
        t, _ = analyzer_for_lang("en").analyze_fast("the running dogs")
        assert t == ["run", "dog"]
        # unknown lang → Standard defaults (no stop, no stem)
        t, _ = analyzer_for_lang("xx").analyze_fast("the running dogs")
        assert t == ["the", "running", "dogs"]


class TestGateGoldens:
    def test_frozen_goldens_match_live_chains(self):
        # _GOLD is the SQL oracle's source of truth; if a chain changes,
        # this fails before the driver gate does.
        from lucene_ray.pipelines.lang_analysis import _GOLD, VOCAB

        for lang, words in VOCAB.items():
            an = analyzer_for_lang(lang)
            for w, gold in zip(words, _GOLD[lang]):
                terms, _ = an.analyze_fast(w)
                assert " ".join(terms) == gold, (lang, w)

    def test_probe_analysis_equals_gold_concat(self, ray_session):
        from lucene_ray.pipelines.lang_analysis import (
            _GOLD,
            VOCAB,
            MultilingualAnalyze,
            probe_text,
        )

        # per-word golden concat == whole-text analysis for every lang
        for lang, words in VOCAB.items():
            an = analyzer_for_lang(lang)
            n = len(words)
            for did in range(12):
                toks, _ = an.analyze_fast(probe_text(did, lang))
                parts = []
                for j in range(3):
                    g = _GOLD[lang][(did * 7 + j * 3 + 1) % n]
                    if g:
                        parts.append(g)
                    if j < 2:
                        parts.append("7")
                assert " ".join(toks) == " ".join(parts), (lang, did)


class TestFuzzSafety:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_stemmers_total(self, w):
        # every chain is total: no exceptions, string out, on ANY input
        for f in (
            spanish_light_stem,
            german_light_stem,
            german_normalize,
            french_light_stem,
            cjk_width_fold,
            make_elision_filter(),
        ):
            out = f(w)
            assert isinstance(out, str)

    @given(st.lists(st.text(min_size=1, max_size=4), max_size=12))
    @settings(max_examples=150, deadline=None)
    def test_cjk_bigram_total_and_position_monotone(self, terms):
        t, p = CJKBigramFilter().apply(terms, None)
        assert len(t) == len(p)
        assert all(p[i] <= p[i + 1] for i in range(len(p) - 1))
