"""suggest / highlight / MoreLikeThis module surfaces."""

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.index_cache import get_or_build_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(get_or_build_index(SF))


def test_suggest_ranks_distance_then_df(searcher):
    t = searcher.suggest("slor", max_edits=2, k=5)
    terms = t.column("term").to_pylist()
    dists = t.column("dist").to_pylist()
    assert terms[0] == "slow" and dists == sorted(dists)
    assert "sort" in terms


def test_suggest_excludes_exact_term(searcher):
    t = searcher.suggest("query", max_edits=2, k=5)
    assert "query" not in t.column("term").to_pylist()


def test_suggest_prefix_bound(searcher):
    # prefix_length=1 restricts candidates to the same first letter
    t = searcher.suggest("qort", max_edits=2, k=5, prefix_length=1)
    assert all(x.startswith("q") for x in t.column("term").to_pylist())


def test_highlight_offsets_point_at_term(ray_session):
    from lucene_ray.pipelines.highlight import HL_QUERIES, highlight_search

    terms = dict(HL_QUERIES)
    rows = highlight_search(SF).take_all()
    assert rows
    for r in rows[:50]:
        t = terms[r["qid"]]
        assert r["end_off"] - r["start_off"] == len(t)
        assert t in r["snippet"]


def test_mlt_seed_excluded_and_scores_desc(ray_session):
    from lucene_ray.pipelines.mlt import MLT_SEEDS, more_like_this

    t = more_like_this(SF)
    assert t.num_rows == len(MLT_SEEDS) * 10
    import pyarrow.compute as pc

    for qid, seed in MLT_SEEDS:
        sub = t.filter(pc.equal(t.column("qid"), qid))
        assert seed not in sub.column("doc_id").to_pylist()
        scores = sub.column("score").to_pylist()
        assert scores == sorted(scores, reverse=True)


def test_mlt_terms_ranking(searcher):
    from lucene_ray.pipelines.mlt import mlt_terms

    sel = mlt_terms(searcher, "dup dup dup the the data", terms_k=2)
    # 'dup' is rare (high tf/(df+1)); 'the' is everywhere
    assert sel[0][0] == "dup" and sel[0][1] == 3


class TestSuggestComplete:
    def test_vs_bruteforce(self, ray_session, tmp_path_factory):
        import pyarrow.parquet as pq

        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.search.searcher import IndexSearcher

        docs = "/root/testdata/sf0.001/documents.parquet"
        d = str(tmp_path_factory.mktemp("cmpl"))
        build_index(docs, d, IndexConfig(rows_per_segment=150, num_buckets=2))
        s = IndexSearcher(d)

        tbl = pq.read_table(docs, columns=["doc_id", "text"])
        df = {}
        for t in tbl.column("text").to_pylist():
            for w in set((t or "").lower().split()):
                df[w] = df.get(w, 0) + 1
        for prefix in ("s", "c", "data", "zzz"):
            got = s.suggest_complete(prefix, k=5)
            want = sorted(
                ((-n, t) for t, n in df.items() if t.startswith(prefix))
            )[:5]
            assert got.column("term").to_pylist() == [t for _, t in want]
            assert got.column("df").to_pylist() == [-n for n, _ in want]
