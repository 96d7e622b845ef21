"""Index-resident vector search gate — ``KnnFloatVectorField`` end to
end: documents and their embeddings are indexed TOGETHER (one segment
holds postings, docmap, norms AND ``vectors.hnsw.npz``), then KNN runs
against the index's own segments via ``search.knn_index`` — the shape
of ``core/document/KnnFloatVectorField.java`` +
``core/search/KnnFloatVectorQuery.java``, where vectors live in the
leaf, not in a side file keyed off the corpus.

The input composition (documents ⋈ embeddings on doc_id = vec_id) is a
driver-side DuckDB join materialized once into a scratch parquet — at
100 TB this would be a Ray Data zip/join producing the build's input
shards; the BUILD itself is the standard partition fan-out either way.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.pipelines.knn import KNN_K, QUERY_VEC_IDS, _load_queries
from lucene_ray.search.knn_index import knn_search_index

CACHE_ROOT = os.environ.get("LUCENE_RAY_CACHE", "/tmp/lucene_ray_idx")

VEC_CONFIG = IndexConfig(
    rows_per_segment=1024,
    num_buckets=2,
    vector_col="embedding",
)


def _joined_input(sf_dir: str) -> str:
    """documents ⋈ embeddings → one scratch parquet (doc_id, text,
    embedding), cached by content mtime."""
    import duckdb

    docs = os.path.join(sf_dir, "documents.parquet")
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha1(
        f"vecjoin:{os.path.abspath(docs)}:{os.path.getmtime(docs)}:"
        f"{os.path.getmtime(emb)}".encode()
    ).hexdigest()[:16]
    out = os.path.join(CACHE_ROOT, f"vecjoin_{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    duckdb.sql(
        f"""
        copy (
          select d.doc_id, d.text, e.embedding
          from '{docs}' d join '{emb}' e on e.vec_id = d.doc_id
          order by d.doc_id
        ) to '{tmp}' (format parquet)
        """
    )
    os.replace(tmp, out)
    return out


def build_vector_index(sf_dir: str) -> str:
    """Build (or reuse) the vector-resident index; returns its dir."""
    src = _joined_input(sf_dir)
    tag = hashlib.sha1(
        f"vecidx:v3:{src}:{os.path.getmtime(src)}:{VEC_CONFIG.rows_per_segment}".encode()
    ).hexdigest()[:16]
    idx_dir = os.path.join(CACHE_ROOT, f"vecidx_{tag}")
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        build_index(src, idx_dir, VEC_CONFIG)
    return idx_dir


def knn_index_resident(sf_dir: str):
    """Driver-gate entry: the standard KNN query set against the
    index's own per-segment vectors+graphs, in gate-exact mode (the
    ``KnnFloatVectorQuery.java`` visitedLimit exact-fallback per leaf,
    provably brute-force-identical) so it hash-matches
    ``sql_knn_cosine``. The approximate graph path and the deleted-doc
    mask stay pinned in tests/test_vector_index.py. Output schema
    matches ``knn_hnsw``."""
    idx = build_vector_index(sf_dir)
    q = _load_queries(sf_dir)
    res = knn_search_index(idx, q, k=KNN_K, exact=True)
    qids = np.asarray([QUERY_VEC_IDS[i] for i in res.column("qi").to_pylist()])
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "rank": res.column("rank"),
            "vec_id": res.column("key"),
            "sim_bp": res.column("sim_bp"),
        }
    )
