"""Minimal-interval semantics (lucene/queries/intervals): kernels vs
brute-force enumeration, IntervalScorer freq/saturation, and the
index-backed IntervalQuery vs text-side recomputation."""

import itertools

import numpy as np
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.intervals import (
    eval_source,
    filter_maxgaps,
    filter_maxwidth,
    interval_freq,
    ordered_intervals,
    saturation_score,
    source_terms,
    unordered_intervals,
)
from lucene_ray.search.query import IntervalQuery
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"


def brute_minimal(pls, ordered):
    cands = set()
    for combo in itertools.product(*[list(map(int, l)) for l in pls]):
        if ordered and any(
            combo[i] >= combo[i + 1] for i in range(len(combo) - 1)
        ):
            continue
        cands.add((min(combo), max(combo)))
    return sorted(
        c
        for c in cands
        if not any(
            d != c and d[0] >= c[0] and d[1] <= c[1] for d in cands
        )
    )


class TestKernels:
    @pytest.mark.parametrize("ordered", [True, False])
    def test_fuzz_vs_bruteforce(self, ordered):
        rng = np.random.default_rng(31)
        for trial in range(200):
            n_terms = int(rng.integers(2, 4))
            # unique positions across terms (one token per position)
            univ = rng.choice(60, size=min(60, 4 * n_terms + 8), replace=False)
            rng.shuffle(univ)
            pls, off = [], 0
            for j in range(n_terms):
                cnt = int(rng.integers(1, 5))
                pls.append(np.sort(univ[off : off + cnt]).astype(np.int64))
                off += cnt
            fn = ordered_intervals if ordered else unordered_intervals
            got = sorted(fn(pls))
            want = brute_minimal(pls, ordered)
            assert got == want, (trial, ordered, [l.tolist() for l in pls])

    def test_filters_and_freq(self):
        iv = [(0, 1), (5, 9), (20, 22)]
        assert filter_maxwidth(iv, 3) == [(0, 1), (20, 22)]
        assert filter_maxgaps(iv, 2, 1) == [(0, 1), (20, 22)]
        # freq: 1/max(len-me+1,1) per interval, me=2
        f = interval_freq([(0, 1), (5, 9)], 2)
        assert f == np.float32(np.float32(1.0) + np.float32(1.0 / 4))
        s = saturation_score(f, pivot=1.0, weight=2.0)
        assert s == np.float32(2.0) * (
            np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + f)
        )

    def test_or_minimized_union_fuzz(self):
        """or = minimized union (DisjunctionIntervalsSource): no kept
        interval contains another, and every dropped one contains a
        kept one."""
        from lucene_ray.search.intervals import minimize

        rng = np.random.default_rng(41)
        for _ in range(100):
            n = int(rng.integers(1, 15))
            iv = [
                (int(s), int(s + rng.integers(0, 6)))
                for s in rng.integers(0, 25, n)
            ]
            got = minimize(iv)
            uniq = set(iv)
            want = sorted(
                c
                for c in uniq
                if not any(
                    d != c and d[0] >= c[0] and d[1] <= c[1] for d in uniq
                )
            )
            assert got == want, iv

    def test_containing_contained_by(self):
        pls = {
            "a": np.array([0, 10], dtype=np.int64),
            "b": np.array([3, 20], dtype=np.int64),
            "c": np.array([1, 15], dtype=np.int64),
        }
        big = ("unordered", ("term", "a"), ("term", "b"))
        # big minimal windows: (0,3) and (10,20)... (3,10) also a window
        iv, me = eval_source(("containing", big, ("term", "c")), pls)
        assert me == 2
        assert all(
            any(s <= q <= e for q in (1, 15)) for s, e in iv
        ) and len(iv) > 0
        iv2, me2 = eval_source(("contained_by", ("term", "c"), big), pls)
        assert me2 == 1
        base, _ = eval_source(big, pls)
        assert iv2 == [
            (q, q)
            for q in (1, 15)
            if any(s <= q <= e for s, e in base)
        ]

    def test_phrase_is_consecutive_ordered(self):
        pls = {
            "a": np.array([0, 5, 9], dtype=np.int64),
            "b": np.array([1, 7, 10], dtype=np.int64),
        }
        iv, me = eval_source(("phrase", ("term", "a"), ("term", "b")), pls)
        assert iv == [(0, 1), (9, 10)] and me == 2  # (5,7) has a gap

    def test_not_containing_and_required(self):
        from lucene_ray.search.intervals import required_terms

        pls = {
            "a": np.array([0, 10], dtype=np.int64),
            "b": np.array([3, 20], dtype=np.int64),
            "x": np.array([1], dtype=np.int64),
        }
        big = ("unordered", ("term", "a"), ("term", "b"))
        base, _ = eval_source(big, pls)
        iv, me = eval_source(("not_containing", big, ("term", "x")), pls)
        assert me == 2
        assert iv == [
            (s, e) for s, e in base if not (s <= 1 <= e)
        ]
        # subtrahend absent entirely → nothing subtracted
        pls2 = dict(pls, x=np.empty(0, dtype=np.int64))
        iv2, _ = eval_source(("not_containing", big, ("term", "x")), pls2)
        assert iv2 == base
        # only the minuend is required for candidate pruning
        assert set(required_terms(("not_containing", big, ("term", "x")))) == {
            "a",
            "b",
        }
        assert required_terms(("or", ("term", "a"), ("term", "b"))) == []
        iv3, _ = eval_source(
            ("not_contained_by", ("term", "x"), big), pls
        )
        assert iv3 == [
            (1, 1)
        ] if not any(s <= 1 <= e for s, e in base) else iv3 == []

    def test_not_containing_searcher_matches_absent_subtrahend(
        self, ray_session, tmp_path
    ):
        """A doc WITHOUT the subtracted term must still match — the
        candidate set may not intersect over the subtrahend's postings."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta",          # matches (no 'bad')
                        "alpha bad beta",      # interval contains 'bad'
                        "alpha beta bad",      # 'bad' outside the interval
                    ]
                ),
            }
        )
        src = str(tmp_path / "nc.parquet")
        pq.write_table(tbl, src)
        d = str(tmp_path / "ncidx")
        build_index(src, d, IndexConfig())
        q = IntervalQuery(
            (
                "not_containing",
                ("ordered", ("term", "alpha"), ("term", "beta")),
                ("term", "bad"),
            )
        )
        r = IndexSearcher(d).search(q, k=10)
        assert sorted(int(k) for k in r["keys"]) == [0, 2]

    def test_or_minextent_and_freq(self):
        pls = {
            "a": np.array([0], dtype=np.int64),
            "b": np.array([4], dtype=np.int64),
        }
        spec = ("or", ("ordered", ("term", "a"), ("term", "b")), ("term", "b"))
        iv, me = eval_source(spec, pls)
        # (4,4) nests inside (0,4) -> union minimizes to the point only
        assert iv == [(4, 4)] and me == 1

    def test_source_spec_validation(self):
        assert source_terms(("maxgaps", 2, ("ordered", ("term", "a"), ("term", "b")))) == ["a", "b"]
        with pytest.raises(ValueError):
            source_terms(("ordered", ("term", "a"), ("term", "a")))
        with pytest.raises(ValueError):
            source_terms(("ordered", ("ordered", ("term", "a")), ("term", "b")))


class TestIntervalQuery:
    @pytest.fixture(scope="class")
    def idx(self, ray_session, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("ividx"))
        build_index(DOCS, d, IndexConfig(rows_per_segment=150))
        return d

    @pytest.mark.parametrize(
        "spec",
        [
            ("phrase", ("term", "scan"), ("term", "column")),
            ("ordered", ("term", "scan"), ("term", "column")),
            ("maxgaps", 4, ("ordered", ("term", "scan"), ("term", "column"))),
            ("unordered", ("term", "sort"), ("term", "order")),
            ("maxwidth", 6, ("unordered", ("term", "join"), ("term", "merge"))),
            ("or", ("ordered", ("term", "scan"), ("term", "column")), ("term", "agg")),
            ("containing", ("unordered", ("term", "sort"), ("term", "order")), ("term", "key")),
        ],
        ids=["phrase", "ordered", "maxgaps", "unordered", "maxwidth", "or",
             "containing"],
    )
    def test_index_matches_text_side(self, idx, spec):
        """Index-decoded positions must reproduce exactly what the
        analyzer sees on the raw text (same kernels both sides)."""
        import pyarrow.parquet as pq

        q = IntervalQuery(spec, boost=1.5)
        r = IndexSearcher(idx).search(q, k=10**6)
        got = dict(zip([int(k) for k in r["keys"]],
                       [float(s) for s in r["scores"]]))
        an = Analyzer()
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        want = {}
        for did, text in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            terms, _ = an.analyze_fast(text or "")
            ta = np.asarray(terms, dtype=object)
            pls = {
                t: np.flatnonzero(ta == t).astype(np.int64)
                for t in source_terms(spec)
            }
            iv, me = eval_source(spec, pls)
            if iv:
                want[int(did)] = float(
                    saturation_score(interval_freq(iv, me), 1.0, 1.5)
                )
        assert got == want
        assert len(got) > 0

    @pytest.mark.parametrize(
        "spec",
        [
            ("maxgaps", 4, ("ordered", ("term", "scan"), ("term", "column"))),
            ("or", ("ordered", ("term", "scan"), ("term", "column")), ("term", "agg")),
        ],
        ids=["maxgaps", "or"],
    )
    def test_memory_index_matches_searcher(self, idx, spec):
        """MemoryIndex (percolator view) interval match set == the
        segmented searcher's — one semantics, two execution shapes."""
        import pyarrow.parquet as pq

        from lucene_ray.search.monitor import MemoryIndex

        q = IntervalQuery(spec)
        r = IndexSearcher(idx).search(q, k=10**6)
        want = sorted(int(k) for k in r["keys"])
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        mem = MemoryIndex(tbl.column("text").to_pylist(), analyzer=Analyzer())
        local = mem.match(q)
        ids = tbl.column("doc_id").to_pylist()
        got = sorted(int(ids[i]) for i in local)
        assert got == want and len(got) > 0
