"""Tumbling-window aggregation and gap sessionization."""

import numpy as np
import pyarrow as pa
import pytest

from whoosh_novo_ray.ops.windows import sessionize, tumbling_window_agg


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    base = np.datetime64("2025-03-01T00:00:00", "us")
    rows = [
        # user 1: two sessions (gap > 30min between idx 1 and 2)
        (0, 1, base + np.timedelta64(0, "m"), "click", 1.0),
        (1, 1, base + np.timedelta64(10, "m"), "click", 2.0),
        (2, 1, base + np.timedelta64(70, "m"), "view", 3.0),
        # user 2: one session
        (3, 2, base + np.timedelta64(5, "m"), "click", 4.0),
        (4, 2, base + np.timedelta64(20, "m"), "view", 5.0),
        # next day
        (5, 1, base + np.timedelta64(1, "D").astype("timedelta64[m]"), "click", 6.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(tbl)


def test_tumbling_window(events):
    out = tumbling_window_agg(events, width_s=86400).take_all()
    key = {(r["event_type"], r["window_start"]): r for r in out}
    day0_clicks = [v for (t, w), v in key.items() if t == "click" and w == min(x[1] for x in key)]
    # day 0 clicks: ids 0,1,3 -> n=3, sum=7
    clicks_day0 = [
        r for r in out if r["event_type"] == "click" and r["n"] == 3
    ]
    assert len(clicks_day0) == 1
    assert clicks_day0[0]["sum_value"] == 7.0
    assert clicks_day0[0]["min_value"] == 1.0
    assert clicks_day0[0]["max_value"] == 4.0
    # day 1 has exactly one click (id 5)
    assert any(r["event_type"] == "click" and r["n"] == 1 for r in out)


def test_sessionize(events):
    out = {r["event_id"]: r for r in sessionize(events, gap_s=1800).take_all()}
    assert len(out) == 6
    # user 1: events 0,1 in session 0; event 2 (70min) in session 1; day-2
    # event 5 in session 2
    assert out[0]["session_idx"] == 0 and out[1]["session_idx"] == 0
    assert out[2]["session_idx"] == 1
    assert out[5]["session_idx"] == 2
    # user 2: one session
    assert out[3]["session_idx"] == 0 and out[4]["session_idx"] == 0
    # session_start of user1 session0 == ts of event 0
    assert out[0]["session_start"] == out[1]["session_start"]
    assert out[2]["session_start"] > out[1]["session_start"]


def test_ivf_knn_recall_and_determinism(ray_session):
    """IVF ANN: deterministic centroids + recall against brute force."""
    import numpy as np
    import ray
    import ray.data

    from whoosh_novo_ray.ops.knn import brute_force_knn, ivf_knn, train_ivf_centroids

    ds = lambda: ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.parquet as pq

    q = (
        pq.read_table("/root/testdata/sf0.01/embeddings.parquet")["embedding"][0]
        .as_py()
    )
    q = np.asarray(q, np.float64)
    c1 = train_ivf_centroids(ds(), n_centroids=8, seed=5)
    c2 = train_ivf_centroids(ds(), n_centroids=8, seed=5)
    assert np.allclose(c1, c2)  # deterministic across runs

    exact = brute_force_knn(ds(), q, k=10)["vec_id"].to_pylist()
    approx = ivf_knn(ds(), q, k=10, n_centroids=8, nprobe=4, centroids=c1)[
        "vec_id"
    ].to_pylist()
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)
    # probing every cell recovers the exact result
    full = ivf_knn(ds(), q, k=10, n_centroids=8, nprobe=8, centroids=c1)
    assert full["vec_id"].to_pylist() == exact
