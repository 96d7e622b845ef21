"""Index-time SynonymGraphFilter: rule parsing, flatten-graph position
discipline, analyzer wiring, and search equivalence end-to-end."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.analysis.synonyms import SynonymGraphFilter


class TestFilterMechanics:
    def test_equivalence_class_inserts_at_same_position(self):
        f = SynonymGraphFilter(["merge, combine"])
        terms, pos = f.apply(["fast", "merge", "sort"], None)
        assert terms == ["fast", "merge", "combine", "sort"]
        assert pos == [0, 1, 1, 2]

    def test_mapping_replaces_originals(self):
        f = SynonymGraphFilter(["huge => big"])
        terms, pos = f.apply(["a", "huge", "table"], None)
        assert terms == ["a", "big", "table"]
        assert pos == [0, 1, 2]

    def test_multiword_input_single_output(self):
        f = SynonymGraphFilter(["sort merge => sortmerge"])
        terms, pos = f.apply(["the", "sort", "merge", "join"], None)
        assert terms == ["the", "sortmerge", "join"]
        # output sits on the FIRST matched position; later tokens keep theirs
        assert pos == [0, 1, 3]

    def test_multiword_equivalence_keeps_originals(self):
        f = SynonymGraphFilter(["table scan, tablescan"])
        terms, pos = f.apply(["big", "table", "scan"], None)
        assert terms == ["big", "table", "tablescan", "scan"]
        assert pos == [0, 1, 1, 2]

    def test_multiword_output_spreads_positions(self):
        f = SynonymGraphFilter(["ny => new york"])
        terms, pos = f.apply(["in", "ny", "city"], None)
        # "new" at ny's position, "york" clamped inside the 1-token span
        assert terms == ["in", "new", "york", "city"]
        assert pos == [0, 1, 1, 2]

    def test_greedy_longest_match_wins(self):
        f = SynonymGraphFilter(["sort => order", "sort merge => sortmerge"])
        terms, _ = f.apply(["sort", "merge"], None)
        assert terms == ["sortmerge"]
        terms2, _ = f.apply(["sort", "scan"], None)
        assert terms2 == ["order", "scan"]

    def test_sparse_positions_preserved(self):
        f = SynonymGraphFilter(["merge, combine"])
        terms, pos = f.apply(["fast", "merge"], [0, 2])  # stopword gap
        assert terms == ["fast", "merge", "combine"]
        assert pos == [0, 2, 2]

    def test_positions_monotone_nondecreasing(self):
        f = SynonymGraphFilter(["a b => x y z", "b, c"])
        terms, pos = f.apply(list("aabbc"), None)
        assert pos == sorted(pos)


class TestAnalyzerWiring:
    def test_analyze_fast_expands(self):
        a = Analyzer(graph_filters=(SynonymGraphFilter(["merge, combine"]),))
        terms, pos = a.analyze_fast("Fast MERGE sort")
        assert terms == ["fast", "merge", "combine", "sort"]
        assert pos == [0, 1, 1, 2]

    def test_analyze_offsets_span_match(self):
        a = Analyzer(
            graph_filters=(SynonymGraphFilter(["sort merge => sortmerge"]),)
        )
        out = a.analyze("the sort merge")
        terms = [t for t, *_ in out]
        assert terms == ["the", "sortmerge"]
        # synonym token's offsets span the matched input words
        t, s, e, p = out[1]
        assert "the sort merge"[s:e] == "sort merge"

    def test_analyze_flat_routes_through_graph(self):
        a = Analyzer(graph_filters=(SynonymGraphFilter(["merge, combine"]),))
        terms, lengths, pos = a.analyze_flat(["fast merge", "no match here"])
        assert list(lengths) == [3, 3]
        assert list(terms[:3]) == ["fast", "merge", "combine"]
        assert pos is not None  # sparse path

    def test_no_filters_unchanged(self):
        a = Analyzer()
        terms, pos = a.analyze_fast("fast merge sort")
        assert terms == ["fast", "merge", "sort"] and pos is None


class TestIndexEndToEnd:
    @pytest.fixture(scope="class")
    def idx(self, ray_session, tmp_path_factory):
        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig

        root = tmp_path_factory.mktemp("syn")
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "fast merge sort",
                        "slow combine scan",
                        "sort merge join",
                        "plain row scan",
                    ]
                ),
            }
        )
        src = str(root / "docs.parquet")
        pq.write_table(tbl, src)
        d = str(root / "idx")
        cfg = IndexConfig(
            rows_per_segment=2,
            num_buckets=1,
            synonyms=("merge, combine", "sort merge => sortmerge"),
        )
        build_index(src, d, cfg)
        return d

    def test_equivalence_both_directions(self, idx):
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(idx)
        # doc 2's "sort merge" is consumed by the greedy-longest mapping
        # rule (=> sortmerge), so its "merge" never reaches the
        # equivalence class — the reference filter's one-match-per-start
        # FST discipline
        keys = set(s.search("combine", k=10)["keys"])
        assert keys == {0, 1}  # merge docs indexed combine too
        keys2 = set(s.search("merge", k=10)["keys"])
        assert keys2 == {0, 1}

    def test_mapped_multiword(self, idx):
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(idx)
        assert set(s.search("sortmerge", k=10)["keys"]) == {2}

    def test_query_side_not_reexpanded(self, idx):
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(idx)
        # the query analyzer must NOT grow token streams
        terms, _ = s.analyzer.analyze_fast("merge")
        assert terms == ["merge"]
