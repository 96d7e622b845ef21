"""Multi-tokenized-field indexing + CombinedFieldQuery (BM25F).

Reference semantics: ``core/search/CombinedFieldQuery.java:228-312``
(pseudo stats: df=max, ttf=Σw·ttf; per-doc freq=Σw·tf) and
``core/search/MultiNormsLeafSimScorer.java:168-180`` (combined norm
re-encoded through SmallFloat).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.codecs.smallfloat import LENGTH_TABLE_INT, int_to_byte4
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.merge import force_merge
from lucene_ray.search.bm25 import idf as bm25_idf
from lucene_ray.search.query import CombinedFieldQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher, localize_query

F32 = np.float32

TEXTS = [
    "the quick brown fox",
    "quick data systems",
    "fox fox fox data",
    "",
    "data",
    "brown cow",
    "the the the quick",
    "lazy dog sleeps",
]
TITLES = ["fox news", "data", "", "quick", "fox data", "cow", "quick", "dog"]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cfq")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS),
            "title": pa.array(TITLES),
        }
    )
    pq.write_table(docs, str(d / "docs.parquet"))
    idx = str(d / "idx")
    build_index(
        str(d / "docs.parquet"),
        idx,
        IndexConfig(rows_per_segment=3, extra_text_cols=("title",)),
    )
    return idx


def reference_bm25f(term, w_text, w_title, k=10):
    """Driver-side clean model of the BM25F algebra for the fixture."""
    toks_t = [t.split() if t else [] for t in TEXTS]
    toks_ti = [t.split() if t else [] for t in TITLES]
    dc = max(
        sum(1 for t in toks_t if t), sum(1 for t in toks_ti if t)
    )
    sttf = int(
        int(w_text * sum(len(t) for t in toks_t))
        + int(w_title * sum(len(t) for t in toks_ti))
    )
    df = max(
        sum(1 for t in toks_t if term in t),
        sum(1 for t in toks_ti if term in t),
    )
    if df == 0:
        return []
    w = bm25_idf(df, dc)
    avgdl = F32(sttf / float(dc))
    from lucene_ray.search.bm25 import BM25Similarity

    inv = BM25Similarity().norm_inverse_cache(avgdl)
    out = []
    for i in range(len(TEXTS)):
        tf = toks_t[i].count(term)
        tfi = toks_ti[i].count(term)
        if tf == 0 and tfi == 0:
            continue
        freq = F32(w_text) * F32(tf) + F32(w_title) * F32(tfi)
        nval = int(
            round(
                w_text * LENGTH_TABLE_INT[int_to_byte4(len(toks_t[i]))]
                + w_title * LENGTH_TABLE_INT[int_to_byte4(len(toks_ti[i]))]
            )
        )
        nb = int_to_byte4(nval)
        s = w - w / (F32(1) + freq * inv[nb])
        out.append((i, float(s)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


class TestCombinedField:
    @pytest.mark.parametrize("term", ["fox", "data", "quick", "the", "cow"])
    def test_matches_reference_model(self, idx, term):
        s = IndexSearcher(idx)
        q = CombinedFieldQuery(term=term, fields=(("text", 1.0), ("title", 2.0)))
        r = s.search(q, k=10)
        exp = reference_bm25f(term, 1.0, 2.0)
        assert [int(k) for k in r["keys"]] == [d for d, _ in exp]
        assert np.allclose(r["scores"], [sc for _, sc in exp], rtol=0, atol=0)

    def test_absent_term_empty(self, idx):
        s = IndexSearcher(idx)
        q = CombinedFieldQuery(term="zzz", fields=(("text", 1.0), ("title", 2.0)))
        assert len(s.search(q, k=5)["docids"]) == 0

    def test_weight_below_one_rejected(self):
        with pytest.raises(ValueError):
            CombinedFieldQuery(term="x", fields=(("text", 0.5),))

    def test_merge_preserves_scores(self, idx, tmp_path):
        import shutil

        d2 = str(tmp_path / "m")
        shutil.copytree(idx, d2)
        s1 = IndexSearcher(idx)
        q = CombinedFieldQuery(term="fox", fields=(("text", 1.0), ("title", 2.0)))
        before = s1.search(q, k=10)
        force_merge(d2, max_segments=1)
        after = IndexSearcher(d2).search(q, k=10)
        assert list(before["keys"]) == list(after["keys"])
        assert np.array_equal(before["scores"], after["scores"])

    def test_field_term_query_uses_field_norms(self, idx):
        """title:fox scores with title norms + title avgdl (not the
        keyword byte-1 path): two docs with same title tf but different
        title lengths must score differently."""
        s = IndexSearcher(idx)
        r = s.search(TermQuery("fox", field="title"), k=10)
        keys = [int(k) for k in r["keys"]]
        assert set(keys) == {0, 4}  # "fox news", "fox data"
        # equal lengths → equal scores here; check norms actually loaded
        seg_fields = {f for seg in s.segments for f in (seg.meta.get("text_fields") or [])}
        assert "title" in seg_fields

    def test_localize_query_rebuilds_foreign_classes(self):
        """Cross-pickle class-identity normalization (the pickle-by-value
        path through __ray_entry__)."""

        class Impostor:
            pass

        Impostor.__name__ = "TermQuery"
        imp = Impostor()
        imp.term, imp.boost, imp.field = "x", 1.0, "text"
        out = localize_query(imp)
        assert type(out) is TermQuery and out.term == "x"
