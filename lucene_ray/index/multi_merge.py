"""Multi-index (multi-tenant) merge scheduling — the fork's
``MultiIndexMergeScheduler`` (``core/index/MultiIndexMergeScheduler.java:39-60``)
re-expressed for Ray.

The reference shunts every index's merges into ONE shared
``ConcurrentMergeScheduler`` so thread/IO budgets balance across tenants.
Here the shared executor is the Ray scheduler itself: merge plans from
all registered indexes flatten into one pool of (index, merge, bucket)
tasks submitted together — Ray balances them across the cluster — with
an optional global in-flight cap (the shared ``maxThreadCount`` role).
Each index's manifest commits independently as its own merges finalize
(the per-directory ``sync()`` role), so one tenant's slow merge never
blocks another tenant's commit.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, List, Optional

from lucene_ray.index.manifest import (
    Manifest,
    commit_manifest,
    load_manifest,
    segment_dir,
)


class MultiIndexMergeScheduler:
    """Register N index dirs (each with its own merge policy), then call
    :meth:`run_round` to execute ONE planning+merge round across all of
    them through a shared Ray task pool, or :meth:`merge_to_completion`
    to iterate until no index plans further merges."""

    def __init__(self, max_in_flight: Optional[int] = None):
        # global cap on concurrently-submitted bucket tasks across ALL
        # indexes (None = let Ray's scheduler decide, usually right)
        self.max_in_flight = max_in_flight
        self._indexes: Dict[str, object] = {}  # dir -> policy

    def register(self, index_dir: str, policy=None) -> "MultiIndexMergeScheduler":
        from lucene_ray.index.merge import TieredMergePolicy

        self._indexes[index_dir] = policy or TieredMergePolicy()
        return self

    def run_round(self) -> Dict[str, Manifest]:
        """Plan each registered index (driver, manifest-only), execute
        every (index, merge, bucket) task in one shared Ray pool, commit
        each index's manifest as soon as its own merges finish. Returns
        {index_dir: manifest} (unchanged manifests included)."""
        import ray

        from lucene_ray.index.merge import _finalize_merge, merge_bucket

        plans = []  # (index_dir, seg_ids, new_seg_id, tmp_dir, n_parts)
        manifests: Dict[str, Manifest] = {}
        for idx, policy in self._indexes.items():
            man = load_manifest(idx)
            if man is None:
                raise FileNotFoundError(f"no manifest in {idx}")
            manifests[idx] = man
            if hasattr(policy, "index_dir"):
                policy.index_dir = idx  # temporal policy binding
            merges = policy.find_merges(man.segments)
            next_id = (
                max(s["seg_id"] for s in man.segments) + 1
                if man.segments
                else 0
            )
            tmp_root = os.path.join(idx, "segments", ".tmp")
            os.makedirs(tmp_root, exist_ok=True)
            for i, ids in enumerate(merges):
                tmp_dir = os.path.join(
                    tmp_root, f"seg_{next_id + i:06d}.merge.{os.getpid()}"
                )
                os.makedirs(tmp_dir, exist_ok=True)
                plans.append(
                    (idx, ids, next_id + i, tmp_dir, man.segments[0]["n_parts"])
                )
        if not plans:
            return manifests

        t0 = time.time()

        @ray.remote
        def bucket_task(idx: str, seg_ids_json: str, b: int, tmp_dir: str) -> str:
            return json.dumps(
                merge_bucket(idx, json.loads(seg_ids_json), b, tmp_dir)
            )

        @ray.remote
        def finalize_task(
            idx: str, seg_ids_json: str, new_seg_id: int, tmp_dir: str,
            *bucket_jsons: str,
        ) -> str:
            results = [json.loads(r) for r in bucket_jsons]
            return json.dumps(
                _finalize_merge(
                    idx, json.loads(seg_ids_json), new_seg_id, tmp_dir,
                    results, t0,
                )
            )

        # ONE shared submission pool: all indexes' bucket tasks interleave
        # and Ray balances them; optional global cap via ray.wait windows
        pending_slots: List = []
        final_futs: Dict[str, List] = {idx: [] for idx in self._indexes}
        plan_of_fut = {}
        for idx, ids, new_id, tmp_dir, n_parts in plans:
            ids_json = json.dumps(ids)
            bucket_futs = []
            for b in range(n_parts):
                if (
                    self.max_in_flight is not None
                    and len(pending_slots) >= self.max_in_flight
                ):
                    _, pending_slots = ray.wait(pending_slots, num_returns=1)
                f = bucket_task.remote(idx, ids_json, b, tmp_dir)
                pending_slots.append(f)
                bucket_futs.append(f)
            ff = finalize_task.remote(idx, ids_json, new_id, tmp_dir, *bucket_futs)
            final_futs[idx].append(ff)
            plan_of_fut[ff] = (idx, ids)

        # per-index sync + commit: an index commits the moment ITS merges
        # are done (MultiIndexMergeScheduler.close() sync semantics)
        out: Dict[str, Manifest] = {}
        for idx, policy in self._indexes.items():
            futs = final_futs[idx]
            if not futs:
                out[idx] = manifests[idx]
                continue
            new_metas = [json.loads(r) for r in ray.get(futs)]
            merged_away = {
                sid for f in futs for sid in plan_of_fut[f][1]
            }
            man = manifests[idx]
            survivors = [
                s for s in man.segments if s["seg_id"] not in merged_away
            ]
            out[idx] = commit_manifest(idx, man.config, survivors + new_metas)
            for sid in merged_away:
                shutil.rmtree(segment_dir(idx, sid), ignore_errors=True)
        return out

    def merge_to_completion(self, max_rounds: int = 16) -> Dict[str, Manifest]:
        """Iterate rounds until no registered index plans a merge."""
        out: Dict[str, Manifest] = {}
        for _ in range(max_rounds):
            before = {
                idx: len(load_manifest(idx).segments) for idx in self._indexes
            }
            out = self.run_round()
            after = {idx: len(out[idx].segments) for idx in self._indexes}
            if before == after:
                break
        return out
