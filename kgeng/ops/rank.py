"""Per-group ranking / order-statistics operators.

- ``top_k_per_group``: the windowed ``row_number() <= k`` pattern.
  Scale shape: ONE shuffle into coarse hash buckets (bounded group
  count), then a single vectorized pandas sort + groupby-head per
  bucket — never one Python call per key.
- ``grouped_quantiles``: exact per-group quantiles (linear
  interpolation, matching SQL ``quantile_cont``). Groups are collected
  per group key, so this is for LOW-CARDINALITY group keys (each
  group's values must fit one task); for high-cardinality keys use the
  same coarse-bucket trick with a per-bucket pandas quantile, and for
  values-per-group beyond task memory a sort-based or t-digest sketch
  path is the scale fallback (documented, not implemented here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _bucket(ds: ray.data.Dataset, key: str, num_buckets: int):
    def f(t: pa.Table) -> pa.Table:
        vals = t[key].to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            h = (vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            b = ((h >> np.uint64(33)) % np.uint64(num_buckets))
        else:
            import zlib

            b = np.array([zlib.crc32(str(v).encode()) % num_buckets
                          for v in vals], dtype=np.uint64)
        return t.append_column("__bucket", pa.array(b.astype(np.int32)))

    return ds.map_batches(f, batch_format="pyarrow")


def top_k_per_group(ds: ray.data.Dataset, key: str, value: str, k: int,
                    tie_breakers: list[str] | None = None,
                    descending: bool = True,
                    num_buckets: int = 64) -> ray.data.Dataset:
    """Top-``k`` rows per ``key`` by ``value`` with deterministic
    tie-breaking (ascending ``tie_breakers`` after the value), plus a
    1-based ``rank`` column — the distributed
    ``row_number() OVER (PARTITION BY key ORDER BY value DESC) <= k``.
    """
    ties = tie_breakers or []

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, value] + ties,
                          ascending=[True, not descending]
                          + [True] * len(ties),
                          kind="mergesort")
        out = g.groupby(key, sort=False).head(k).copy()
        out["rank"] = out.groupby(key, sort=False).cumcount() + 1
        return out.drop(columns=["__bucket"])

    return _bucket(ds, key, num_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")


def grouped_quantiles(ds: ray.data.Dataset, key: str, value: str,
                      quantiles: list[float],
                      round_to: int = 6) -> ray.data.Dataset:
    """Exact per-group quantiles (linear interpolation = SQL
    ``quantile_cont``): one row per (key, q). Group count must be low —
    each group's values are gathered into one task."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value].to_numpy(dtype=np.float64)
        qs = [round(float(np.quantile(vals, q, method="linear")), round_to)
              for q in quantiles]
        return pd.DataFrame({key: [g[key].iloc[0]] * len(quantiles),
                             "q": quantiles, "quantile_value": qs})

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")
