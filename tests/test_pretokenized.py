"""Pre-tokenized ingestion — the fork's ``TokenStreamColumn`` path
(``core/document/column/TokenStreamColumn.java:23-37``,
``ColumnValidation.java:249-270``): caller-supplied ``list<string>``
token columns invert verbatim, bypassing the analyzer, and must produce
a bit-identical index to the analyzed build when the tokens are the
analyzer's own output."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.segment import invert_texts, invert_token_lists

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")


def _assert_inv_equal(a, b):
    assert a.terms.equals(b.terms)
    np.testing.assert_array_equal(a.term_starts, b.term_starts)
    np.testing.assert_array_equal(a.pair_docids, b.pair_docids)
    np.testing.assert_array_equal(a.pair_tfs, b.pair_tfs)
    np.testing.assert_array_equal(a.doc_lengths, b.doc_lengths)
    if a.positions is None:
        assert b.positions is None
    else:
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.pos_starts, b.pos_starts)


@pytest.mark.parametrize("with_positions", [True, False])
def test_token_lists_match_analyzed_inversion(with_positions):
    """Feeding the analyzer's own tokens through invert_token_lists must
    reproduce invert_texts exactly (terms, postings, positions, lengths)."""
    texts = pq.read_table(DOCS, columns=["text"]).column("text").to_pylist()[:200]
    an = Analyzer()
    ref = invert_texts(texts, an, with_positions=with_positions)
    token_lists = pa.array(
        [an.analyze_fast(t)[0] for t in texts], pa.list_(pa.string())
    )
    got = invert_token_lists(token_lists, with_positions=with_positions)
    _assert_inv_equal(ref, got)


def test_null_list_is_empty_doc():
    tokens = pa.array([["a", "b"], None, [], ["b"]], pa.list_(pa.string()))
    inv = invert_token_lists(tokens, with_positions=True)
    np.testing.assert_array_equal(inv.doc_lengths, [2, 0, 0, 1])
    assert inv.terms.to_pylist() == ["a", "b"]
    np.testing.assert_array_equal(inv.pair_docids, [0, 0, 3])
    np.testing.assert_array_equal(inv.pair_tfs, [1, 1, 1])
    # dense positions: "b" is position 1 in doc 0, position 0 in doc 3
    np.testing.assert_array_equal(inv.positions, [0, 1, 0])


def test_null_token_rejected():
    tokens = pa.array([["a", None]], pa.list_(pa.string()))
    with pytest.raises(ValueError, match="null tokens"):
        invert_token_lists(tokens, with_positions=False)


def test_python_list_input_and_large_list():
    got = invert_token_lists([["x", "y", "x"]], with_positions=True)
    assert got.terms.to_pylist() == ["x", "y"]
    np.testing.assert_array_equal(got.pair_tfs, [2, 1])
    big = pa.array([["x", "y", "x"]], pa.large_list(pa.large_string()))
    got2 = invert_token_lists(big, with_positions=True)
    _assert_inv_equal(got, got2)


def test_config_rejects_double_duty_token_column():
    # ColumnValidation.java:249-270 — token-stream columns are
    # inverted-index-only
    with pytest.raises(ValueError, match="inverted-index-only"):
        IndexConfig(pretokenized=True, text_col="tokens", dv_cols=("tokens",))


def test_pretokenized_build_equals_analyzed_build(ray_session, tmp_path):
    """Build the same corpus both ways (analyzer inline vs pre-tokenized
    list column) and compare search results query-by-query."""
    from lucene_ray.search.searcher import IndexSearcher

    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    an = Analyzer()
    toks = pa.array(
        [an.analyze_fast(t)[0] for t in tbl.column("text").to_pylist()],
        pa.large_list(pa.large_string()),
    )
    tok_path = str(tmp_path / "tokens.parquet")
    pq.write_table(
        pa.table({"doc_id": tbl.column("doc_id"), "tokens": toks}), tok_path
    )

    d_ref = str(tmp_path / "idx_ref")
    d_tok = str(tmp_path / "idx_tok")
    build_index(DOCS, d_ref, IndexConfig(rows_per_segment=150, num_buckets=2))
    build_index(
        tok_path,
        d_tok,
        IndexConfig(
            rows_per_segment=150,
            num_buckets=2,
            text_col="tokens",
            pretokenized=True,
        ),
    )
    s_ref = IndexSearcher(d_ref)
    s_tok = IndexSearcher(d_tok)
    for q in ["data", "the", "spark merge", '"data processing"', "+batch +stream"]:
        r1 = s_ref.search(q, k=20)
        r2 = s_tok.search(q, k=20)
        assert r1["keys"] == r2["keys"], q
        np.testing.assert_array_equal(r1["scores"], r2["scores"])
        assert r1["total_hits"] == r2["total_hits"]
