"""Skew-aware aggregation: partial (combiner) pre-aggregation and hot-key
salting — the north rule's explicit skew handling for Zipfian entity keys.

``salted_count``: count rows per key without ever forming a hot-key group:
1. map_batches: vectorized per-batch value_counts -> (key, partial_count)
   — one row per key per batch, so the shuffle moves partials, not rows;
2. salt: append ``#<h%S>`` to the key so even a single dominant key spreads
   over S reducers;
3. groupby(salted) sum -> unsalt -> second (tiny) groupby(key) sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def salted_count(ds: ray.data.Dataset, key: str, salt: int = 16,
                 out: str = "n", key_type=None) -> ray.data.Dataset:
    """Row count per distinct ``key`` value; skew-immune. Returns
    Dataset(key, out). Non-string keys salt through their decimal
    string form; pass ``key_type`` (a pyarrow type) to cast the result
    key column back."""

    def partial(t: pa.Table) -> pa.Table:
        counts = t.group_by([key]).aggregate([([], "count_all")])
        ks = counts[key].combine_chunks()
        if not pa.types.is_string(ks.type):
            ks = pc.cast(ks, pa.string())
        cnt = counts["count_all"]
        # salt on a stable content hash of the key string
        np_keys = np.array([hash_str(s) % salt for s in ks.to_pylist()],
                           dtype=np.int64)
        salted = pc.binary_join_element_wise(
            ks, pa.scalar("#"), pa.array(np_keys.astype(str)), "")
        return pa.table({"salted": salted,
                         "partial": pc.cast(cnt, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    summed = partials.groupby("salted").sum("partial")
    summed = summed.map_batches(
        lambda t: t.rename_columns(["salted", "partial"]),
        batch_format="pyarrow")

    def unsalt(t: pa.Table) -> pa.Table:
        ks = t["salted"].to_pylist()
        bare = [s.rsplit("#", 1)[0] for s in ks]
        return pa.table({key: pa.array(bare, pa.string()),
                         "partial": t["partial"]})

    unsalted = summed.map_batches(unsalt, batch_format="pyarrow")
    final = unsalted.groupby(key).sum("partial")

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns([key, out])
        if key_type is not None:
            t = t.set_column(0, key, pc.cast(t[key], key_type))
        return t

    return final.map_batches(finish, batch_format="pyarrow")


def hash_str(s: str) -> int:
    """Stable string hash (FNV-1a 64) — never Python's randomized hash()."""
    h = 0xcbf29ce484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def partial_sum(ds: ray.data.Dataset, key: str, value: str,
                out: str = "total") -> ray.data.Dataset:
    """Partial+final SUM(value) GROUP BY key (combiner pattern): per-batch
    vectorized group-sum, then a global groupby over the partials."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([key]).aggregate([(value, "sum")])
        return g.rename_columns([key, "partial"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(key).sum("partial")
    return final.map_batches(
        lambda t: t.rename_columns([key, out]), batch_format="pyarrow")
