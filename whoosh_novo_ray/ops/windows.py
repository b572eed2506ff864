"""Event-stream batch operators: windowed aggregates and sessionization.

Batch expressions of the streaming-window shapes a training-data pipeline
needs over an events table (ts, key, value):

* ``tumbling_window_agg`` — fixed-width time buckets per key: the window
  assignment is a pure vectorized map (no state), so the only exchange is
  the (key, window) groupby with combiner aggregation.
* ``sessionize`` — gap-based sessions per user: rows shuffle once by a hash
  bucket of the key, then each bucket is sorted and split vectorized
  (diff > gap -> new session), never one Python call per user.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window_agg(
    events: "ray.data.Dataset",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_s: int = 3600,
) -> "ray.data.Dataset":
    """Per (key, tumbling window) aggregates: count, sum, mean, min, max.

    Window start = floor(ts / width) * width (epoch-aligned). The bucketing
    map is stateless; the groupby pre-combines per block before the shuffle.
    """

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy()  # microseconds
        width_us = np.int64(width_s) * 1_000_000
        win = (ts // width_us) * width_us
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": pa.array(win, pa.int64()),
                value_col: batch[value_col],
            }
        )

    bucketed = events.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    agg = bucketed.groupby([key_col, "window_start"]).aggregate(
        Count(),
        Sum(value_col),
        Mean(value_col),
        Min(value_col),
        Max(value_col),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "window_start": batch["window_start"],
                "n": batch["count()"].cast(pa.int64()),
                "sum_value": batch[f"sum({value_col})"].cast(pa.float64()),
                "mean_value": batch[f"mean({value_col})"].cast(pa.float64()),
                "min_value": batch[f"min({value_col})"].cast(pa.float64()),
                "max_value": batch[f"max({value_col})"].cast(pa.float64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def sessionize(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Assign gap-based session ids per user.

    Output: one row per event (event_id, user_id, session_idx, session_start)
    where session_idx numbers a user's sessions in time order (0-based) and a
    new session starts when the gap since the previous event > gap_s.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[user_col].cast(pa.int64()).to_numpy()
        bucket = (
            pd.util.hash_array(keys.astype(np.uint64)) % np.uint64(num_buckets)
        ).astype(np.uint32)
        return batch.append_column("__bucket", pa.array(bucket, pa.uint32()))

    gap_us = np.int64(gap_s) * 1_000_000

    def split_sessions(group: pa.Table) -> pa.Table:
        g = group.sort_by([(user_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")])
        users = g[user_col].cast(pa.int64()).to_numpy()
        ts = g[ts_col].cast(pa.int64()).to_numpy()
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    user_col: pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                }
            )
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap_break = np.empty(n, bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_session = new_user | gap_break
        # session ordinal within user: cumsum of session starts, reset per user
        sess_global = np.cumsum(new_session)
        user_first = np.where(new_user)[0]
        # value of sess_global at each user's first row, broadcast per row
        runs = np.diff(np.append(user_first, n))
        base = np.repeat(sess_global[user_first], runs)
        session_idx = (sess_global - base).astype(np.int64)
        # session start ts broadcast to members
        start_rows = np.where(new_session)[0]
        sruns = np.diff(np.append(start_rows, n))
        session_start = np.repeat(ts[start_rows], sruns)
        return pa.table(
            {
                id_col: g[id_col].cast(pa.int64()),
                user_col: pa.array(users, pa.int64()),
                "session_idx": pa.array(session_idx, pa.int64()),
                "session_start": pa.array(session_start, pa.int64()),
            }
        )

    return (
        events.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(split_sessions, batch_format="pyarrow")
    )
