"""Hash-partitioned join + session windows."""

import pandas as pd
import pyarrow as pa
import ray.data

from kgeng.ops.join import hash_join
from kgeng.ops.window import sessionize, tumbling


def test_hash_join_inner_matches_pandas():
    left = pa.table({"k": [1, 2, 2, 3, 5], "a": list("xyzuv")})
    right = pa.table({"k": [2, 3, 3, 4], "b": list("pqrs")})
    got = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k", num_buckets=4).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
    key = ["k", "a", "b"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True))


def test_hash_join_string_key():
    left = pa.table({"k": ["a", "b"], "x": [1, 2]})
    right = pa.table({"k": ["b", "c"], "y": [10, 20]})
    got = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "k").to_pandas()
    assert got[["k", "x", "y"]].values.tolist() == [["b", 2, 10]]


def test_sessionize_gap_splits():
    ts = pd.to_datetime([
        "2024-01-01 10:00", "2024-01-01 10:10",   # session 1
        "2024-01-01 11:30",                        # session 2 (80m gap)
        "2024-01-01 11:40",
    ])
    ev = pa.table({"user_id": [7] * 4, "ts": ts})
    out = sessionize(ray.data.from_arrow(ev), gap_minutes=30).to_pandas()
    out = out.sort_values("session_id")
    assert out["n_events"].tolist() == [2, 2]
    assert out["session_id"].tolist() == [1, 2]


def test_tumbling_counts():
    ts = pd.to_datetime(["2024-01-01 00:00:30", "2024-01-01 00:00:50",
                         "2024-01-01 00:01:10"])
    ev = pa.table({"k": ["a"] * 3, "ts": ts, "v": [1.0, 2.0, 3.0]})
    out = tumbling(ray.data.from_arrow(ev), "k", "ts", "v",
                   width_seconds=60).to_pandas().sort_values("window")
    assert out["n"].tolist() == [2, 1]
    assert out["total"].tolist() == [3.0, 3.0]
