"""Million-query sharded-tier proof (VERDICT r4 #9): run the
shard-partitioned query tier on a >=1M-query stream over the bench
corpus index and record wall, QPS and peak driver RSS — evidence that
the chunked phase-0 stats exchange (search/sharded.py chunk_queries)
keeps driver state bounded in the long-stream regime.

Usage: python tools/million_query_bench.py [n_queries] (default 1M)
Prints one JSON line; record the result in BASELINE.md.
"""
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_QUERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "64000"))

import ray

ray.init(
    address="local",
    num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    include_dashboard=False,
    logging_level="ERROR",
)
import ray.data
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from lucene_ray.corpus.generator import write_corpus
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.sharded import search_dataset_sharded

sys.path.insert(0, REPO)
from bench import build_query_set  # noqa: E402

corpus_dir = f"/tmp/lucene_ray_bench/pages_{N_DOCS}"
paths = write_corpus(corpus_dir, N_DOCS, n_files=32)
index_dir = f"/tmp/lucene_ray_bench/mq_idx_{N_DOCS}"
cfg = IndexConfig(
    key_col="url",
    text_col="text",
    rows_per_segment=max(2000, N_DOCS // 64),
    num_buckets=4,
)
build_index(paths, index_dir, cfg)

base = build_query_set(N_DOCS)  # 6120 mixed queries
reps = -(-N_QUERIES // len(base))
items = []
qid = 0
for _ in range(reps):
    for q in base:
        items.append({"qid": qid, "query": q["query"]})
        qid += 1
        if qid >= N_QUERIES:
            break
    if qid >= N_QUERIES:
        break

qds = ray.data.from_items(items)
rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
t0 = time.time()
res = search_dataset_sharded(index_dir, qds, k=10, n_shards=4)
n_rows = res.count()
wall = time.time() - t0
rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(
    json.dumps(
        {
            "metric": "sharded query tier, long stream",
            "n_queries": N_QUERIES,
            "n_docs": N_DOCS,
            "n_shards": 4,
            "chunk_queries": 250_000,
            "wall_s": round(wall, 1),
            "qps": round(N_QUERIES / wall, 1),
            "result_rows": int(n_rows),
            "driver_peak_rss_mb": round(rss1 / 1024, 1),
            "driver_rss_before_mb": round(rss0 / 1024, 1),
        }
    )
)
ray.shutdown()
