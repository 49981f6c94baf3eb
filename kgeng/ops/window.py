"""Stream-shaped operators over an ordered, partitioned log.

Ray Data has no event-time windows or watermarks (guide §streaming);
windows are expressed as ``groupby(key).map_groups`` where the group fn
sorts by timestamp and applies the window logic with pandas. Ordering
assumption: correctness requires only per-key ordering, established
inside each group — input partition order is irrelevant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def sessionize(events: ray.data.Dataset, key: str = "user_id",
               ts: str = "ts", gap_minutes: float = 30.0,
               ) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap since
    the previous event exceeds ``gap_minutes``. Returns one row per
    session: (key, session_id, n_events, session_start, session_end),
    ``session_id`` = 1-based rank of the session within the key.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        new_sess = (g[ts].diff() > gap) | g[ts].diff().isna()
        sess_id = new_sess.cumsum()
        out = g.groupby(sess_id.values).agg(
            n_events=(ts, "size"),
            session_start=(ts, "min"),
            session_end=(ts, "max"))
        out = out.reset_index(drop=True)
        out.insert(0, "session_id", np.arange(1, len(out) + 1))
        out.insert(0, key, g[key].iloc[0])
        return out

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def tumbling(events: ray.data.Dataset, key: str, ts: str, value: str,
             width_seconds: int) -> ray.data.Dataset:
    """Tumbling windows per key: vectorized bucket column + groupby
    aggregate (count + sum). The partial pre-aggregation happens inside
    map_batches (see queries.events_tumbling_window for the wired-up
    version with an oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    us = width_seconds * 1_000_000

    def bucket(t: pa.Table) -> pa.Table:
        # normalize to microseconds first: pandas-born timestamps arrive
        # as timestamp[ns] and a bare int64 cast would be in ns
        t_us = pc.cast(t[ts], pa.timestamp("us"))
        b = pc.divide(pc.cast(t_us, pa.int64()), us)
        return pa.table({key: t[key], "window": b, value: t[value]})

    from ray.data.aggregate import Count, Sum

    return events.map_batches(bucket, batch_format="pyarrow") \
        .groupby([key, "window"]).aggregate(
            Count(alias_name="n"), Sum(value, alias_name="total"))
