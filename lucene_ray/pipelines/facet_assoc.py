"""Association facets — sum-of-association-values per category over a
drill-down match set.

Reference semantics: ``lucene/facet/src/java/org/apache/lucene/facet/
taxonomy/FloatAssociationFacetField.java`` + ``TaxonomyFacetFloat
Associations`` (each doc carries (category, value) pairs; facet counts
aggregate the VALUES, not the doc count, over the query's match set).

Here the events table plays the doc stream: category = ``event_type``,
association value = ``value``, drill-down = a timestamp window (integer
µs compares — deterministic).  Values are quantized to integer
micro-units BEFORE summing on both the engine and oracle sides, so the
distributed sum is order-free and hash-exact (the ``lm_perplexity`` /
``collocations`` integer device).

Scale shape: per-batch combiner (one np.unique partial per batch) →
one tiny ``groupby(event_type)`` sum — only |categories| rows shuffle.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# drill-down window: Jan 5–15 of the synthetic stream (2024-01-05 to
# 2024-01-15 UTC, epoch microseconds)
T_LO_US = 1_704_412_800_000_000
T_HI_US = 1_705_276_800_000_000


def facet_associations(sf_dir: str):
    """→ (event_type, n, sum_micro) over events in the drill-down
    window, ordered by (sum_micro desc, event_type)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def partials(b: pa.Table) -> pa.Table:
        ts = np.asarray(
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            dtype=np.int64,
        )
        keep = (ts >= T_LO_US) & (ts < T_HI_US)
        types = np.asarray(b.column("event_type").to_pylist(), dtype=object)[
            keep
        ]
        vals = np.asarray(b.column("value"), dtype=np.float64)[keep]
        micro = np.floor(vals * 1_000_000 + 0.5).astype(np.int64)
        cats, idx = np.unique(types, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(cats, pa.string()),
                "n": pa.array(np.bincount(idx, minlength=len(cats)).astype(np.int64)),
                "sum_micro": pa.array(
                    np.bincount(idx, weights=micro, minlength=len(cats))
                    .astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_micro", alias_name="sum_micro"))
        .sort(["sum_micro", "event_type"], descending=[True, False])
    )


def sql_facet_associations() -> str:
    return f"""
select event_type,
       count(*)::bigint as n,
       cast(sum(cast(floor(value * 1000000 + 0.5) as bigint)) as bigint)
         as sum_micro
from events
where epoch_us(ts) >= {T_LO_US} and epoch_us(ts) < {T_HI_US}
group by event_type
order by sum_micro desc, event_type
"""
