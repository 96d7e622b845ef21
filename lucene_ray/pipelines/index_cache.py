"""Build-once index cache for the driver's per-query callables.

``build_index`` is idempotent + resumable, so repeated calls on the same
corpus reuse completed segments and only re-commit the manifest.
"""

from __future__ import annotations

import hashlib
import os

from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig

CACHE_ROOT = os.environ.get("LUCENE_RAY_CACHE", "/tmp/lucene_ray_idx")

# documents tables are small; a few segments exercise the multi-segment paths
DEFAULT_CONFIG = IndexConfig(rows_per_segment=2048, num_buckets=2)


def index_dir_for(
    sf_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    table: str = "documents",
) -> str:
    docs = os.path.join(sf_dir, f"{table}.parquet")
    tag = hashlib.sha1(
        f"{os.path.abspath(docs)}:{os.path.getmtime(docs)}:{sorted(config.to_json().items())}".encode()
    ).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, tag)


def get_or_build_index(
    sf_dir: str,
    config: IndexConfig = DEFAULT_CONFIG,
    table: str = "documents",
) -> str:
    docs = os.path.join(sf_dir, f"{table}.parquet")
    idx = index_dir_for(sf_dir, config, table)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        os.makedirs(idx, exist_ok=True)
        build_index(docs, idx, config)
    return idx
