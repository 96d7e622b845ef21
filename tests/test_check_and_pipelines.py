"""CheckIndex-analogue validator + dedup/events/multimodal pipeline tests."""

import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.check import check_index, check_segment
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.manifest import load_manifest, segment_dir

DOCS = "/root/testdata/sf0.001/documents.parquet"
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chk"))
    build_index(DOCS, d, IndexConfig(rows_per_segment=200, num_buckets=2))
    return d


class TestCheckIndex:
    def test_healthy_index_passes(self, index_dir):
        assert check_index(index_dir) == []

    def test_detects_corruption(self, index_dir, tmp_path):
        import shutil

        d = str(tmp_path / "corrupt")
        shutil.copytree(index_dir, d)
        man = load_manifest(d)
        sdir = segment_dir(d, man.segments[0]["seg_id"])
        # flip a byte in the postings file
        path = os.path.join(sdir, "part_0000.postings.bin")
        data = bytearray(open(path, "rb").read())
        data[len(data) // 2] ^= 0xFF
        open(path, "wb").write(bytes(data))
        problems = check_segment(sdir)
        assert problems, "corrupted postings must be detected"

    def test_detects_stat_drift(self, index_dir, tmp_path):
        import json
        import shutil

        d = str(tmp_path / "drift")
        shutil.copytree(index_dir, d)
        mp = os.path.join(d, "manifest.json")
        man = json.load(open(mp))
        man["field_stats"]["sum_ttf"] += 1
        json.dump(man, open(mp, "w"))
        assert any("sum_ttf" in p for p in check_index(d))


class TestDedupPipelines:
    def test_minhash_matches_exact(self, ray_session):
        """LSH-found pairs == exact all-pairs trigram Jaccard ≥ 0.8."""
        import duckdb

        from lucene_ray.pipelines.dedup import minhash_lsh_dedup, sql_minhash_lsh_dedup

        got = minhash_lsh_dedup(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"create view documents as select * from '{DOCS}'")
        want = con.execute(sql_minhash_lsh_dedup()).df()
        assert len(got) == len(want)
        assert list(got["a"]) == list(want["a"])
        assert list(got["j_bp"]) == list(want["j_bp"])
        assert len(got) > 0, "testdata contains near-dups; must find some"

    def test_simhash_deterministic_and_finds_neardups(self, ray_session):
        from lucene_ray.pipelines.dedup import simhash_pairs

        p1 = simhash_pairs(SF).to_pandas()
        p2 = simhash_pairs(SF).to_pandas()
        assert p1.equals(p2)
        assert (p1["hamming"] <= 8).all()

    def test_embedding_near_dup(self, ray_session):
        import duckdb

        from lucene_ray.pipelines.dedup import embedding_near_dup, sql_embedding_near_dup

        got = embedding_near_dup(SF).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"create view embeddings as select * from '{SF}/embeddings.parquet'"
        )
        want = con.execute(sql_embedding_near_dup()).df()
        assert list(got["a"]) == list(want["a"])
        assert list(got["c_bp"]) == list(want["c_bp"])


class TestEventsPipelines:
    def test_window_matches_sql(self, ray_session):
        import duckdb

        from lucene_ray.pipelines.events import (
            sql_tumbling_window_stats,
            tumbling_window_stats,
        )

        got = (
            tumbling_window_stats(SF)
            .to_pandas()
            .sort_values(["event_type", "w_us"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(f"create view events as select * from '{SF}/events.parquet'")
        want = (
            con.execute(sql_tumbling_window_stats())
            .df()
            .sort_values(["event_type", "w_us"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        for c in ["n", "sum_bp", "min_bp", "max_bp"]:
            assert list(got[c]) == list(want[c]), c


class TestMultimodal:
    def test_image_features_plumbing(self, ray_session, tmp_path):
        from lucene_ray.corpus.generator import write_corpus
        from lucene_ray.pipelines.multimodal import image_features

        paths = write_corpus(str(tmp_path / "pages"), 200, n_files=2, use_ray=False)
        out = image_features(paths, concurrency=2, batch_size=64).to_pandas()
        assert len(out) == 200
        assert set(out.columns) == {"url", "thumb", "thumb_mean", "payload_bytes",
                                    "width", "height", "real_decode"}
        assert all(len(t) == 64 for t in out["thumb"])
        # deterministic across runs
        out2 = image_features(paths, concurrency=2, batch_size=64).to_pandas()
        assert list(out["thumb_mean"]) == list(out2["thumb_mean"])

    def test_frame_sampling(self, ray_session, tmp_path):
        import ray.data

        from lucene_ray.corpus.generator import write_corpus
        from lucene_ray.pipelines.multimodal import SampleFrames

        paths = write_corpus(str(tmp_path / "p2"), 50, n_files=1, use_ray=False)
        ds = ray.data.read_parquet(paths, columns=["url", "html"])
        ds = ds.map_batches(
            lambda b: pa.table({"url": b.column("url"), "payload": b.column("html")}),
            batch_format="pyarrow",
        )
        out = ds.map_batches(
            SampleFrames, batch_format="pyarrow", batch_size=32, concurrency=2
        ).to_pandas()
        assert len(out) >= 50
        assert (out["frame_idx"] % 4 == 0).all()


class TestQualityAndSampling:
    def test_gopher_quality_vs_bruteforce(self, ray_session):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import _GOPHER_STOPS, gopher_quality

        got = gopher_quality(SF).to_pandas().set_index("doc_id")
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        import re

        alpha_re = re.compile("[A-Za-z]")
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            words = [w for w in (t or "").split(" ") if w]
            n = len(words)
            chars = sum(len(w) for w in words)
            nstop = sum(1 for w in words if w in _GOPHER_STOPS)
            nalpha = sum(1 for w in words if alpha_re.search(w))
            row = got.loc[d]
            assert row["n_words"] == n
            assert row["n_word_chars"] == chars
            assert row["n_stop"] == nstop
            assert row["n_alpha"] == nalpha
            keep = (
                50 <= n <= 100000
                and 3 * n <= chars <= 10 * n
                and nstop >= 2
                and 5 * nalpha >= 4 * n
            )
            assert bool(row["keep"]) == keep

    def test_gopher_quality_empty_and_short_docs(self, ray_session):
        # empty text and a sub-50-word doc both yield keep=False with
        # zero-safe stats
        import ray.data
        from lucene_ray.pipelines.corpus_ops import gopher_quality

        got = gopher_quality(SF).to_pandas()
        assert (got.loc[got["n_words"] < 50, "keep"] == False).all()  # noqa: E712

    def test_sample_hash_deterministic_and_fraction(self, ray_session):
        import hashlib

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import sample_hash

        a = sorted(sample_hash(SF).to_pandas()["doc_id"])
        b = sorted(sample_hash(SF).to_pandas()["doc_id"])
        assert a == b  # restart-stable
        ids = pq.read_table(DOCS, columns=["doc_id"]).column("doc_id").to_pylist()
        want = [
            i
            for i in ids
            if int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
            % 100
            < 10
        ]
        assert a == sorted(want)
        # ~10% within loose tolerance on 500 docs
        assert 0.03 < len(a) / len(ids) < 0.25


class TestRepetitionStats:
    def test_vs_bruteforce(self, ray_session):
        import pyarrow.parquet as pq
        from collections import Counter
        from lucene_ray.pipelines.corpus_ops import repetition_stats

        got = repetition_stats(SF).to_pandas().set_index("doc_id")
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            ws = (t or "").split(" ")
            tris = [
                (ws[i], ws[i + 1], ws[i + 2])
                for i in range(max(len(ws) - 2, 0))
                if ws[i] and ws[i + 1] and ws[i + 2]
            ]
            c = Counter(tris)
            row = got.loc[d]
            assert row["n_trigrams"] == len(tris)
            assert row["n_unique"] == len(c)
            assert row["max_repeat"] == (max(c.values()) if c else 0)

    def test_repeated_text_detected(self, ray_session, tmp_path):
        # a pathological doc ("spam spam spam ...") must show max_repeat
        # >> 1 and n_unique == 1
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data
        from lucene_ray.pipelines.corpus_ops import repetition_stats

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(
                        ["spam spam spam spam spam", "a b c d e"], pa.string()
                    ),
                }
            ),
            str(d / "documents.parquet"),
        )
        got = repetition_stats(str(d)).to_pandas().set_index("doc_id")
        assert got.loc[1, "n_trigrams"] == 3
        assert got.loc[1, "n_unique"] == 1
        assert got.loc[1, "max_repeat"] == 3
        assert got.loc[2, "max_repeat"] == 1


class TestTokenCounts:
    def test_vs_bruteforce(self, ray_session):
        import re

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import BPE_PATTERN, token_counts

        got = token_counts(SF).to_pandas().set_index("doc_id")
        pat = re.compile(BPE_PATTERN)
        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        for d, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            row = got.loc[d]
            assert row["ws_tokens"] == len([w for w in (t or "").split(" ") if w])
            assert row["bpe_tokens"] == len(pat.findall(t or ""))


class TestHoppingWindows:
    def test_each_event_in_exactly_n_hops_windows(self, ray_session):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.events import hopping_window_stats

        sf = "/root/testdata/sf0.001"
        got = hopping_window_stats(sf, window_s=3600, step_s=900).to_pandas()
        n_events = pq.ParquetFile(sf + "/events.parquet").metadata.num_rows
        assert got["n"].sum() == n_events * 4  # window/step replicas
        # every window start is step-aligned
        assert (got["w_us"] % (900 * 1_000_000) == 0).all()

    def test_tumbling_is_degenerate_hop(self, ray_session):
        from lucene_ray.pipelines.events import (
            hopping_window_stats,
            tumbling_window_stats,
        )

        sf = "/root/testdata/sf0.001"
        hop = (
            hopping_window_stats(sf, window_s=3600, step_s=3600)
            .to_pandas()
            .sort_values(["event_type", "w_us"])
            .reset_index(drop=True)
        )
        tum = (
            tumbling_window_stats(sf, window_s=3600)
            .to_pandas()
            .sort_values(["event_type", "w_us"])
            .reset_index(drop=True)
        )
        assert hop[["event_type", "w_us", "n", "sum_bp"]].equals(
            tum[["event_type", "w_us", "n", "sum_bp"]]
        )


class TestStratifiedSample:
    def test_balanced_and_deterministic(self, ray_session):
        import hashlib

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import sample_stratified

        a = sample_stratified(SF, per_lang=7).to_pandas()
        b = sample_stratified(SF, per_lang=7).to_pandas()
        ka = sorted(map(tuple, a[["doc_id", "lang"]].values.tolist()))
        kb = sorted(map(tuple, b[["doc_id", "lang"]].values.tolist()))
        assert ka == kb  # deterministic
        counts = a.groupby("lang").size()
        assert (counts <= 7).all()
        # brute force: smallest md5-hex per lang
        tbl = pq.read_table(DOCS, columns=["doc_id", "lang"])
        by_lang = {}
        for d, l in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("lang").to_pylist()
        ):
            by_lang.setdefault(l, []).append(
                (hashlib.md5(str(d).encode()).hexdigest(), d)
            )
        want = sorted(
            (d, l)
            for l, rows in by_lang.items()
            for _, d in sorted(rows)[:7]
        )
        assert ka == want


class TestLengthQuantiles:
    def test_matches_numpy_type1_rule(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import length_quantiles

        got = length_quantiles(SF).to_pandas()
        vals = np.sort(
            pq.read_table(DOCS, columns=["n_chars"]).column("n_chars").to_numpy()
        )
        n = len(vals)
        for q, v in zip(got["q_bp"], got["value"]):
            rank = (int(q) * n + 9999) // 10000  # ceil(q*n), 1-indexed
            assert int(v) == int(vals[max(rank, 1) - 1])

    def test_extremes(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import length_quantiles

        t = pa.table(
            {
                "doc_id": pa.array(list(range(4)), pa.int64()),
                "n_chars": pa.array([5, 1, 9, 9], pa.int64()),
            }
        )
        d = tmp_path / "lq"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        got = length_quantiles(str(d), q_bps=(1, 2500, 5000, 10000)).to_pandas()
        # ranks over sorted [1,5,9,9]: ceil(.0001*4)=1→1, ceil(.25*4)=1→1,
        # ceil(.5*4)=2→5, ceil(1*4)=4→9
        assert list(got["value"]) == [1, 1, 5, 9]


class TestCollocations:
    def test_matches_bruteforce_pmi(self, ray_session):
        import math

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import collocations

        got = collocations(SF, min_count=3, k=15).to_pandas()
        texts = pq.read_table(DOCS, columns=["text"]).column("text").to_pylist()
        from collections import Counter

        uni, bi = Counter(), Counter()
        for t in texts:
            ws = (t or "").split(" ")
            uni.update(w for w in ws if w != "")
            bi.update(
                (a, b)
                for a, b in zip(ws, ws[1:])
                if a != "" and b != ""
            )
        n_uni, n_bi = sum(uni.values()), sum(bi.values())
        scored = []
        for (a, b), c in bi.items():
            if c < 3:
                continue
            pmi = math.floor(
                math.log((c * n_uni * n_uni) / (uni[a] * uni[b] * n_bi))
                * 1_000_000
                + 0.5
            )
            scored.append((-pmi, a, b, c))
        scored.sort()
        want = [(a, b, c, -np) for np, a, b, c in scored[:15]]
        assert (
            list(map(tuple, got[["w1", "w2", "c_ab", "pmi_micro"]].values)) == want
        )

    def test_empty_token_rows(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import collocations

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a  b a b", "", "a b a b a b"]),
            }
        )
        d = tmp_path / "col"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        got = collocations(str(d), min_count=2, k=10).to_pandas()
        # 'a  b' has an empty middle token: no (a,b) bigram from doc 0
        pairs = dict(
            ((r.w1, r.w2), r.c_ab) for r in got.itertuples(index=False)
        )
        assert pairs[("a", "b")] == 4  # doc0 'a b' once + doc2 three times
        assert pairs[("b", "a")] == 3  # doc0 'b a' + doc2 twice


class TestDecontaminate:
    def test_matches_bruteforce(self, ray_session):
        import hashlib

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import decontaminate

        n, pct = 4, 5
        got = decontaminate(SF, n=n, pct=pct).to_pandas()
        t = pq.read_table(DOCS, columns=["doc_id", "text"])
        ev_grams, tr_grams = set(), {}
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            ws = (txt or "").split(" ")
            grams = {
                " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
            }
            is_eval = (
                int.from_bytes(
                    hashlib.md5(str(did).encode()).digest()[:8], "big"
                )
                % 100
                < pct
            )
            if is_eval:
                ev_grams |= grams
            else:
                tr_grams[did] = grams
        want = sorted(
            (did, len(g & ev_grams))
            for did, g in tr_grams.items()
            if g & ev_grams
        )
        assert list(map(tuple, got[["doc_id", "n_contaminated"]].values)) == want
        assert len(want) > 0  # non-trivial at sf0.001 with n=4

    def test_row_boundary_windows(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.corpus_ops import decontaminate

        # doc_id=1 is in the 5% eval slice under the md5 selector?  Pin
        # instead: find one eval id among 0..99 and craft the corpus.
        import hashlib

        def is_eval(i):
            return (
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[:8], "big"
                )
                % 100
                < 5
            )

        ev_id = next(i for i in range(1000) if is_eval(i))
        tr_id = next(i for i in range(1000) if not is_eval(i))
        tr2 = next(i for i in range(tr_id + 1, 1000) if not is_eval(i))
        # train doc tr_id ends with 'x y'; eval doc starts with 'z w':
        # the cross-row window 'x y z w' must NOT count as a gram.
        t = pa.table(
            {
                "doc_id": pa.array([tr_id, ev_id, tr2], pa.int64()),
                "text": pa.array(["a b x y", "z w a b", "x y z w"]),
            }
        )
        d = tmp_path / "dc"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        got = decontaminate(str(d), n=2, pct=5).to_pandas()
        res = dict(zip(got["doc_id"], got["n_contaminated"]))
        # eval grams: {'z w','w a','a b'}; train tr_id grams {'a b','b x','x y'}
        # → 1 hit; tr2 grams {'x y','y z','z w'} → 1 hit ('z w')
        assert res == {tr_id: 1, tr2: 1}


class TestCurateCorpus:
    def test_funnel_equals_stage_intersection(self, ray_session):
        import hashlib

        from lucene_ray.pipelines.corpus_ops import decontaminate, gopher_quality
        from lucene_ray.pipelines.curate import curate_corpus
        from lucene_ray.pipelines.dedup import dedup_components

        got = curate_corpus(SF).to_pandas()
        q = gopher_quality(SF).to_pandas()
        quality = set(q.loc[q["keep"], "doc_id"])
        comp = dedup_components(SF).to_pandas()
        canonical = set(comp.loc[comp["keep"] == 1, "doc_id"]) | (
            set(q["doc_id"]) - set(comp["doc_id"])
        )
        contaminated = set(decontaminate(SF).to_pandas()["doc_id"])
        train = {
            d
            for d in q["doc_id"]
            if int.from_bytes(
                hashlib.md5(str(int(d)).encode()).digest()[:8], "big"
            )
            % 100
            >= 5
        }
        want = sorted((quality & train & canonical) - contaminated)
        assert list(got["doc_id"]) == want
        assert 0 < len(want) < len(q)  # a real funnel, not a no-op

    def test_export_curated_partitioned(self, ray_session, tmp_path):
        import os

        import pyarrow.parquet as pq
        from lucene_ray.pipelines.curate import curate_corpus, export_curated

        out = str(tmp_path / "curated")
        n = export_curated(SF, out)
        kept = curate_corpus(SF).to_pandas()
        assert n == len(kept)
        langs = sorted(
            d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")
        )
        assert langs == sorted(set(kept["lang"]))
        back = pq.read_table(out).to_pandas()
        assert sorted(back["doc_id"]) == sorted(kept["doc_id"])
        assert (back["text"].str.len() > 0).all()

    def test_report_consistent_with_funnel(self, ray_session):
        import pyarrow.parquet as pq
        from lucene_ray.pipelines.curate import curate_corpus, curation_report

        rep = curation_report(SF).to_pandas()
        kept = curate_corpus(SF).to_pandas()
        docs = pq.read_table(DOCS, columns=["doc_id", "source"]).to_pandas()
        by_src = docs.groupby("source").size()
        kept_src = (
            docs.set_index("doc_id").loc[kept["doc_id"], "source"]
            .value_counts()
        )
        assert rep["n_docs"].sum() == len(docs)
        for r in rep.itertuples(index=False):
            assert r.n_docs == by_src[r.source]
            assert r.n_final == kept_src.get(r.source, 0)
            assert r.n_final <= r.n_quality_train <= r.n_docs
