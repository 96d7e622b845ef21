"""Facet counting + grouped top-k over match sets (lucene/facet and
lucene/grouping roles over doc-values columns)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.searcher import IndexSearcher

DOCS = "/root/testdata/sf0.001/documents.parquet"

CFG = IndexConfig(
    rows_per_segment=150,
    keyword_cols=("lang",),
    dv_cols=("lang", "n_chars"),
)


@pytest.fixture(scope="module")
def searcher(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fgidx"))
    build_index(DOCS, d, CFG)
    return IndexSearcher(d)


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(DOCS)


class TestFacets:
    def test_counts_match_bruteforce(self, searcher, corpus):
        ids = corpus.column("doc_id").to_pylist()
        langs = corpus.column("lang").to_pylist()
        texts = corpus.column("text").to_pylist()
        match = {d for d, t in zip(ids, texts) if "data" in (t or "").split()}
        want = {}
        for d, l in zip(ids, langs):
            if d in match:
                want[l] = want.get(l, 0) + 1
        t = searcher.facet_counts("data", "lang")
        got = dict(zip(t.column("value").to_pylist(), t.column("n").to_pylist()))
        assert got == want
        # sorted by (count desc, value asc)
        ns = t.column("n").to_pylist()
        assert ns == sorted(ns, reverse=True)

    def test_empty_match_set(self, searcher):
        t = searcher.facet_counts("zzzabsent", "lang")
        assert t.num_rows == 0


class TestGrouping:
    def test_group_topk_matches_global_order(self, searcher, corpus):
        ids = corpus.column("doc_id").to_pylist()
        langs = {d: l for d, l in zip(ids, corpus.column("lang").to_pylist())}
        full = searcher.search("data", k=10**9, mode="exhaustive")
        per_group = {}
        for d, s in zip(full["keys"], full["scores"]):
            per_group.setdefault(langs[d], []).append((-float(s), d))
        t = searcher.group_topk("data", "lang", k_per_group=3)
        for g in set(t.column("group").to_pylist()):
            want = [d for _, d in sorted(per_group[g])[:3]]
            sel = [
                (r, k)
                for grp, r, k in zip(
                    t.column("group").to_pylist(),
                    t.column("rank").to_pylist(),
                    t.column("key").to_pylist(),
                )
                if grp == g
            ]
            got = [k for _, k in sorted(sel)]
            assert got == want

    def test_group_scores_are_search_scores(self, searcher):
        t = searcher.group_topk("data", "lang", k_per_group=1)
        full = searcher.search("data", k=1)
        # the overall best doc is rank 0 of its own group
        best_key = full["keys"][0]
        rows = dict(
            zip(t.column("key").to_pylist(), t.column("score").to_pylist())
        )
        assert best_key in rows
        assert np.float32(rows[best_key]) == full["scores"][0]


class TestDrillSideways:
    """DrillSideways (lucene/facet DrillSideways.java): each dim counts
    with its own filter removed; hits = fully drilled."""

    @pytest.fixture(scope="class")
    def ds_searcher(self, ray_session, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("dsidx"))
        build_index(
            DOCS,
            d,
            IndexConfig(
                rows_per_segment=150,
                keyword_cols=("lang", "source"),
                dv_cols=("lang", "source"),
            ),
        )
        return IndexSearcher(d)

    def test_matches_bruteforce(self, ds_searcher, corpus):
        rows = list(
            zip(
                corpus.column("doc_id").to_pylist(),
                corpus.column("lang").to_pylist(),
                corpus.column("source").to_pylist(),
                corpus.column("text").to_pylist(),
            )
        )
        base = [(d, l, s_) for d, l, s_, t in rows if "data" in (t or "").split()]
        r = ds_searcher.drill_sideways(
            "data",
            drill_downs=(("lang", "en"), ("source", "src0")),
            facet_fields=("lang", "source"),
        )
        want_lang = {}
        for _, l, s_ in base:
            if s_ == "src0":
                want_lang[l] = want_lang.get(l, 0) + 1
        want_source = {}
        for _, l, s_ in base:
            if l == "en":
                want_source[s_] = want_source.get(s_, 0) + 1
        assert r["facets"]["lang"] == want_lang
        assert r["facets"]["source"] == want_source
        assert r["hits"] == sum(
            1 for _, l, s_ in base if l == "en" and s_ == "src0"
        )

    def test_no_drilldown_dim_counts_fully_drilled(self, ds_searcher, corpus):
        """A facet dim WITHOUT a drill-down counts over base + all
        filters (n_chars-free case: facet lang, drill source only)."""
        r = ds_searcher.drill_sideways(
            "data", drill_downs=(("source", "src0"),), facet_fields=("lang",)
        )
        rows = list(
            zip(
                corpus.column("lang").to_pylist(),
                corpus.column("source").to_pylist(),
                corpus.column("text").to_pylist(),
            )
        )
        want = {}
        for l, s_, t in rows:
            if s_ == "src0" and "data" in (t or "").split():
                want[l] = want.get(l, 0) + 1
        assert r["facets"]["lang"] == want
        assert r["hits"] == sum(want.values())


class TestFacetRanges:
    def test_ranges_match_bruteforce(self, searcher, corpus):
        ids = corpus.column("doc_id").to_pylist()
        ncs = corpus.column("n_chars").to_pylist()
        texts = corpus.column("text").to_pylist()
        match_nc = [
            n for d, t, n in zip(ids, texts, ncs)
            if "data" in (t or "").split()
        ]
        ranges = (("a", 0, 249), ("b", 250, 449), ("c", 400, 10**12))
        t = searcher.facet_ranges("data", "n_chars", ranges)
        got = dict(zip(t.column("range").to_pylist(), t.column("n").to_pylist()))
        for lab, lo, hi in ranges:
            assert got[lab] == sum(1 for n in match_nc if lo <= n <= hi)
        # output preserves caller's range order
        assert t.column("range").to_pylist() == ["a", "b", "c"]

    def test_overlapping_ranges_double_count(self, searcher, corpus):
        # one doc inside both overlapping ranges counts once per range
        full = (("all1", 0, 10**12), ("all2", 0, 10**12))
        t = searcher.facet_ranges("data", "n_chars", full)
        ns = t.column("n").to_pylist()
        assert ns[0] == ns[1] > 0

    def test_empty_match_set_ranges(self, searcher):
        t = searcher.facet_ranges("zzzabsent", "n_chars", (("a", 0, 10**12),))
        assert t.column("n").to_pylist() == [0]


class TestFacetTaxonomy:
    def test_hierarchy_vs_bruteforce(self, ray_session, tmp_path_factory, corpus):
        from lucene_ray.index.build import build_index
        from lucene_ray.index.config import IndexConfig
        from lucene_ray.search.searcher import IndexSearcher

        d = str(tmp_path_factory.mktemp("taxidx"))
        build_index(
            DOCS,
            d,
            IndexConfig(
                rows_per_segment=150, dv_cols=("source", "lang")
            ),
        )
        s = IndexSearcher(d)
        t = s.facet_taxonomy("data", ("source", "lang"))
        got = dict(zip(t.column("path").to_pylist(), t.column("n").to_pylist()))

        ids = corpus.column("doc_id").to_pylist()
        texts = corpus.column("text").to_pylist()
        srcs = corpus.column("source").to_pylist()
        langs = corpus.column("lang").to_pylist()
        want = {}
        for i, tx in zip(range(len(ids)), texts):
            if "data" in (tx or "").split():
                want[srcs[i]] = want.get(srcs[i], 0) + 1
                p = f"{srcs[i]}/{langs[i]}"
                want[p] = want.get(p, 0) + 1
        assert got == want
        # parent count == sum of its children
        for p, n in got.items():
            if "/" not in p:
                assert n == sum(
                    v for q, v in got.items() if q.startswith(p + "/")
                )


class TestDiversifiedTopK:
    def test_greedy_cap_vs_bruteforce(self, searcher, corpus):
        t = searcher.search_diversified("data", "lang", max_per_key=2, k=15)
        # brute-force greedy reference
        ids = corpus.column("doc_id").to_pylist()
        langs = dict(zip(ids, corpus.column("lang").to_pylist()))
        r = searcher.search("data", k=10**6)
        hits = sorted(
            zip([-float(s) for s in r["scores"]], [int(k) for k in r["keys"]])
        )
        taken, want = {}, []
        for ns, d in hits:
            g = langs[d]
            if taken.get(g, 0) >= 2:
                continue
            taken[g] = taken.get(g, 0) + 1
            want.append(d)
            if len(want) >= 15:
                break
        assert t.column("key").to_pylist() == want
        # no key exceeds the cap
        from collections import Counter

        assert max(Counter(t.column("key_value").to_pylist()).values()) <= 2

    def test_cap_one_gives_distinct_keys(self, searcher):
        t = searcher.search_diversified("data", "lang", max_per_key=1, k=10)
        vals = t.column("key_value").to_pylist()
        assert len(vals) == len(set(vals))
