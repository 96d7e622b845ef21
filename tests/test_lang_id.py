"""Char-trigram language ID: trigram kernel vs brute force, profile
determinism, oracle parity (Cavnar & Trenkle-style profiles with
integer dot products)."""
import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.pipelines.lang_id import _trigram_codes


def _brute(texts):
    out = []
    for i, t in enumerate(texts):
        for j in range(len(t) - 2):
            tri = t[j : j + 3]
            code = ord(tri[0]) << 42 | ord(tri[1]) << 21 | ord(tri[2])
            out.append((i, code))
    return out


class TestTrigramKernel:
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=30,
            ),
            max_size=8,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_brute_force(self, texts):
        codes, doc_of = _trigram_codes(texts)
        got = sorted(zip(doc_of.tolist(), codes.tolist()))
        assert got == sorted(_brute(texts))

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=32,
                    max_codepoint=0x10FFFF,
                    blacklist_categories=("Cs",),
                ),
                max_size=20,
            ),
            max_size=6,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_brute_force_unicode(self, texts):
        # ADVICE r4: the old non-ASCII fallback collided distinct
        # codepoints mod 256; the 21-bit pack is injective for all of
        # Unicode and must agree with per-char brute force
        codes, doc_of = _trigram_codes(texts)
        got = sorted(zip(doc_of.tolist(), codes.tolist()))
        assert got == sorted(_brute(texts))

    def test_unicode_pack_injective_and_ordered(self):
        # distinct codepoint triples → distinct codes, and numeric code
        # order == string order (DuckDB binary collation parity)
        tris = ["abc", "abd", "éfg", "日本語", "ЖЗИ", "\U0010fffd\x01\x01"]
        codes = [_trigram_codes([t])[0][0] for t in tris]
        assert len(set(codes)) == len(tris)
        assert [t for _, t in sorted(zip(codes, tris))] == sorted(tris)

    def test_separator_never_leaks(self):
        # doc boundary windows must not produce trigrams
        codes, doc_of = _trigram_codes(["ab", "cd", "ef"])
        assert len(codes) == 0

    def test_short_and_empty_docs(self):
        codes, doc_of = _trigram_codes(["", "a", "ab", "abc"])
        assert doc_of.tolist() == [3]

    def test_real_language_discrimination(self):
        # real-language text produces distinguishable profiles: the
        # trigram sets of French vs German sample text barely overlap
        fr = "le gouvernement français annonce une nouvelle politique économique pour les régions"
        de = "die deutsche bundesregierung beschließt neue wirtschaftspolitische maßnahmen für die länder"
        cf, _ = _trigram_codes([fr])
        cg, _ = _trigram_codes([de])
        inter = len(set(cf.tolist()) & set(cg.tolist()))
        assert inter / max(len(set(cf.tolist())), 1) < 0.3


SF = "/root/testdata/sf0.001"


class TestOracleParity:
    def test_matches_sql(self, ray_session):
        from lucene_ray.pipelines.lang_id import lang_id, sql_lang_id

        got = lang_id(SF).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{SF}/documents.parquet'"
        )
        want = con.execute(sql_lang_id()).df()
        assert len(got) == len(want)
        for c in ("doc_id", "lang_pred", "score"):
            assert (got[c].values == want[c].values).all(), c
