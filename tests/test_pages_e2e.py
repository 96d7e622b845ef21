"""Pages-corpus end-to-end: the input_hint shape with string (url) keys,
html→text byte-identity, url dedup-by-latest (updateDocument semantics),
and the CLI entry surface."""

import json
import subprocess
import sys

import numpy as np
import pytest

from lucene_ray.corpus.generator import extract_text, generate_pages, write_corpus


class TestCorpusInvariants:
    def test_partition_purity(self):
        a = generate_pages(100, 50)
        b = generate_pages(0, 200).slice(100, 50)
        assert a.equals(b)

    def test_html_text_byte_identity(self):
        tbl = generate_pages(0, 300)
        for h, t in zip(tbl.column("html").to_pylist(), tbl.column("text").to_pylist()):
            assert extract_text(h) == t

    def test_edge_docs_present(self):
        texts = generate_pages(0, 500).column("text").to_pylist()
        joined = "\n".join(texts)
        assert "İstanbul" in joined          # lowercase trap
        assert "カタカナ" in joined            # kana
        assert "x" * 256 in joined           # >255 run
        assert "" in texts                   # empty doc

    def test_dup_every_reuses_urls_with_later_ts(self):
        tbl = generate_pages(0, 400, dup_every=10)
        urls = tbl.column("url").to_pylist()
        ts = tbl.column("warc_ts").to_pylist()
        by_url = {}
        dups = 0
        for u, t in zip(urls, ts):
            if u in by_url:
                dups += 1
                assert t > by_url[u]  # recrawl strictly later
            else:
                by_url[u] = t
        assert dups >= 30


class TestPagesPipeline:
    def test_build_dedup_search(self, ray_session, tmp_path):
        import ray.data

        from lucene_ray.pipelines.pages import (
            build_pages_index,
            dedup_pages_latest,
            extract_text_stage,
        )
        from lucene_ray.search.searcher import IndexSearcher

        corpus = str(tmp_path / "pages")
        import os

        import pyarrow.parquet as pq

        os.makedirs(corpus)
        tbl = generate_pages(0, 600, dup_every=8)
        pq.write_table(tbl, f"{corpus}/pages_0000.parquet")

        # extraction stage verifies byte identity
        ds = ray.data.read_parquet(f"{corpus}/pages_0000.parquet")
        out = extract_text_stage(ds, verify=True).to_pandas()
        assert out["extract_mismatch"].sum() == 0

        n_unique = len(set(tbl.column("url").to_pylist()))
        deduped = dedup_pages_latest(
            ray.data.read_parquet(f"{corpus}/pages_0000.parquet")
        )
        assert deduped.count() == n_unique

        idx = str(tmp_path / "idx")
        man = build_pages_index(
            [f"{corpus}/pages_0000.parquet"], idx, str(tmp_path / "wk"),
            rows_per_segment=200,
        )
        assert man.total_docs == n_unique
        s = IndexSearcher(idx)
        res = s.search("istanbul", k=5)
        # url keys come back as strings
        assert all(isinstance(k, str) and k.startswith("https://") for k in res["keys"])
        # the lowercase-trap doc is findable via simple-lowercase semantics
        assert res["total_hits"] >= 1

    def test_latest_version_wins(self, ray_session, tmp_path):
        """After dedup+index, a dup url's searchable text is the latest."""
        import os

        import pyarrow.parquet as pq
        import ray.data

        from lucene_ray.pipelines.pages import dedup_pages_latest

        tbl = generate_pages(0, 200, dup_every=5)
        p = str(tmp_path / "d.parquet")
        pq.write_table(tbl, p)
        dd = dedup_pages_latest(ray.data.read_parquet(p)).to_pandas()
        raw = tbl.to_pandas()
        latest = raw.sort_values(["warc_ts", "text"]).groupby("url").tail(1)
        merged = dd.set_index("url")["text"].to_dict()
        for _, r in latest.iterrows():
            assert merged[r["url"]] == r["text"]


class TestCLI:
    def test_cli_build_search_check(self, tmp_path):
        import os

        import pyarrow.parquet as pq

        corpus = str(tmp_path / "c")
        os.makedirs(corpus)
        pq.write_table(generate_pages(0, 300), f"{corpus}/p.parquet")
        idx = str(tmp_path / "i")
        env = dict(os.environ, RAY_ADDRESS="local")

        def run(*args):
            r = subprocess.run(
                [sys.executable, "-m", "lucene_ray", *args],
                capture_output=True, text=True, cwd="/root/repo", env=env,
            )
            assert r.returncode == 0, r.stderr[-2000:]
            return json.loads(r.stdout.strip().splitlines()[-1])

        out = run("build", "--input", corpus, "--index", idx,
                  "--key-col", "url", "--rows-per-segment", "100",
                  "--num-cpus", "4")
        assert out["docs"] == 300 and out["segments"] == 3
        out = run("merge", "--index", idx, "--force-max", "1",
                  "--num-cpus", "4")
        assert out["segments"] == 1
        out = run("search", "--index", idx, "--query", "the", "--k", "3",
                  "--num-cpus", "2")
        assert len(out["hits"]) <= 3
        out = run("check", "--index", idx, "--num-cpus", "2")
        assert out["healthy"]

    def test_cli_multifield_points_build(self, tmp_path):
        """ray-job surface with the multi-field knobs: keyword/dv/point
        columns + field-scoped query with a point-path range filter."""
        import os

        import pyarrow.parquet as pq

        corpus = str(tmp_path / "c2")
        os.makedirs(corpus)
        pq.write_table(generate_pages(0, 200), f"{corpus}/p.parquet")
        idx = str(tmp_path / "i2")
        env = dict(os.environ, RAY_ADDRESS="local")

        def run(*args):
            r = subprocess.run(
                [sys.executable, "-m", "lucene_ray", *args],
                capture_output=True, text=True, cwd="/root/repo", env=env,
            )
            assert r.returncode == 0, r.stderr[-2000:]
            return json.loads(r.stdout.strip().splitlines()[-1])

        run("build", "--input", corpus, "--index", idx,
            "--key-col", "url", "--rows-per-segment", "100",
            "--keyword-cols", "lang", "--dv-cols", "warc_ts,lang",
            "--point-cols", "warc_ts", "--num-cpus", "4")
        out = run("search", "--index", idx, "--query", "#lang:en the",
                  "--k", "5", "--num-cpus", "2")
        assert out["total_hits"] >= len(out["hits"]) > 0
        # CheckIndex validates the timestamp point sidecar (sortedness,
        # doc set == non-null DV rows) built through the CLI path
        out = run("check", "--index", idx, "--num-cpus", "2")
        assert out["healthy"]
        from lucene_ray.search.searcher import IndexSearcher

        segs = IndexSearcher(idx).segments
        assert all(s.point_index("warc_ts") is not None for s in segs)
