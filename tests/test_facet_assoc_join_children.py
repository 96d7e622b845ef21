"""Association facets + ToChildBlockJoin: engine vs DuckDB oracle
parity at sf0.001 (same comparison the driver gate runs)."""
import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"create view {t} as select * from '{SF}/{t}.parquet'"
        )
    return con


class TestFacetAssociations:
    def test_matches_oracle(self, ray_session):
        from lucene_ray.pipelines.facet_assoc import (
            facet_associations,
            sql_facet_associations,
        )

        got = facet_associations(SF).to_pandas()
        want = _con().execute(sql_facet_associations()).df()
        assert len(got) == len(want) > 0
        for c in ("event_type", "n", "sum_micro"):
            assert (got[c].values == want[c].values).all(), c

    def test_sum_is_order_free(self, ray_session):
        # integer quantization: re-running yields identical sums even
        # though float summation order differs across block layouts
        from lucene_ray.pipelines.facet_assoc import facet_associations

        a = facet_associations(SF).to_pandas()
        b = facet_associations(SF).to_pandas()
        assert (a["sum_micro"].values == b["sum_micro"].values).all()


class TestBlockJoinChildren:
    def test_matches_oracle(self, ray_session):
        from lucene_ray.pipelines.join import (
            block_join_children,
            sql_block_join_children,
        )

        got = block_join_children(SF).to_pandas()
        want = _con().execute(sql_block_join_children()).df()
        assert len(got) == len(want) > 0
        assert (got["source"].values == want["source"].values).all()
        assert (got["doc_id"].values == want["doc_id"].values).all()
        assert np.array_equal(
            got["score"].values, want["score"].values.astype(np.float32)
        )

    def test_children_cover_parents_exactly(self, ray_session):
        # every child of a selected parent appears exactly once, and the
        # child set equals the parent's full block
        from lucene_ray.pipelines.join import block_join_children

        got = block_join_children(SF).to_pandas()
        docs = _con().execute(
            "select source, doc_id from documents"
        ).df()
        for src, g in got.groupby("source"):
            want_ids = set(
                docs[docs.source == src]["doc_id"].tolist()
            )
            assert set(g["doc_id"].tolist()) == want_ids
            assert len(g) == len(want_ids)
            assert g["score"].nunique() == 1  # parent score propagated


class TestRangeFields:
    def test_matches_oracle(self, ray_session):
        from lucene_ray.pipelines.range_fields import (
            range_field_search,
            sql_range_field_search,
        )

        got = range_field_search(SF).to_pandas()
        want = _con().execute(sql_range_field_search()).df()
        assert len(got) == len(want) > 0
        for c in ("qid", "doc_id", "lo", "hi"):
            assert (got[c].values == want[c].values).all(), c

    def test_relation_algebra(self, ray_session):
        # crosses = intersects − within − contains, disjointly
        from lucene_ray.pipelines.range_fields import range_field_search

        df = range_field_search(SF).to_pandas()
        by = {q: set(g["doc_id"]) for q, g in df.groupby("qid")}
        inter = by.get(0, set())
        within = by.get(1, set())
        contains = by.get(2, set())
        crosses = by.get(3, set())
        assert within <= inter and contains <= inter
        assert crosses == inter - within - contains
