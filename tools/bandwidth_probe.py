"""Machine-ceiling probe for the scaling protocol (BASELINE.md).

Runs a FIXED batch of pure-compute tasks — the build hot path's invert
kernel on in-memory synthetic text, no I/O, no object-store traffic, no
shuffle, no coordination beyond ray.get — at two parallelism levels in
fresh Ray sessions. If an embarrassingly parallel, zero-communication
loop doesn't reach 4x from 8→32 cpus, the gap is the box (shared DRAM
bandwidth / host tenancy), not engine architecture: any distributed
plan, however perfect, inherits this ceiling on ONE node, while on a
real 4x-node cluster each node brings its own DRAM.

Usage: python tools/bandwidth_probe.py [n_tasks] → one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _leg(ncpu: int, n_tasks: int) -> float:
    """One fresh-process run → seconds for n_tasks invert tasks."""
    code = f"""
import sys, time
sys.path.insert(0, {REPO!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")

@ray.remote
def work(i):
    from lucene_ray.analysis.analyzer import Analyzer
    from lucene_ray.index.segment import invert_texts
    texts = [(f"tok{{j % 997}} alpha beta gamma delta " * 30)
             for j in range(3000)]
    invert_texts(texts, Analyzer(), with_positions=True)
    return i

ray.get([work.remote(i) for i in range({ncpu})])  # warm workers
t0 = time.time()
ray.get([work.remote(i) for i in range({n_tasks})])
print(time.time() - t0)
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    ).stdout
    return float(out.strip().splitlines()[-1])


def main() -> None:
    n_tasks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    t8 = min(_leg(8, n_tasks), _leg(8, n_tasks))
    t32 = min(_leg(32, n_tasks), _leg(32, n_tasks))
    print(
        json.dumps(
            {
                "metric": "pure-compute invert kernel, zero coordination",
                "n_tasks": n_tasks,
                "sec_8": round(t8, 3),
                "sec_32": round(t32, 3),
                "speedup": round(t8 / t32, 3),
                "machine_ceiling_efficiency": round((t8 / t32) / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
