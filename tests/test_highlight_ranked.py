"""Passage-ranked highlighting (UnifiedHighlighter passage pipeline on
the fixed-window/integer-weight subset): engine vs DuckDB oracle, and
kernel unit checks (window split, tie-break, multi-term weighting)."""
import duckdb
import numpy as np
import pyarrow as pa

from lucene_ray.pipelines.highlight import (
    HLR_QUERIES,
    PASSAGE_W,
    highlight_ranked,
    sql_highlight_ranked,
)

SF = "/root/testdata/sf0.001"


def test_matches_oracle(ray_session):
    got = highlight_ranked(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    want = con.execute(sql_highlight_ranked()).df()
    assert len(got) == len(want) > 0
    for c in ["qid", "doc_id", "pidx", "score", "passage"]:
        assert (got[c].values == want[c].values).all(), c


def test_best_passage_properties(ray_session):
    got = highlight_ranked(SF).to_pandas()
    by_q = {q: {} for q, _, _ in HLR_QUERIES}
    for q, t, w in HLR_QUERIES:
        by_q[q][t] = w
    # every winning passage contains at least one query term, its score
    # equals the weighted term count of its own window, and the window
    # is at most PASSAGE_W tokens
    for _, row in got.head(300).iterrows():
        toks = row["passage"].split(" ")
        assert len(toks) <= PASSAGE_W
        weights = by_q[row["qid"]]
        score = sum(weights.get(t, 0) for t in toks)
        assert score == row["score"] > 0
