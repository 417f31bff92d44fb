"""Reassembly family (reference: src/deskew/deskew.cpp, rotate.cpp) — the
engine's one wide (shuffle) step.

Reference semantics: ``findAngle`` mode-votes the dominant line angle
(deskew.cpp:172-201), ``findOrientation`` detects coarse 0/90/180/270
flips (deskew.cpp:70-136), ``rotate`` applies the permutation
(rotate.cpp:35-72), ``deskew`` composes all three (deskew.cpp:208-251).

Transcript analogue: a conversation's turns arrive out of order; the
dominant ordering direction is mode-voted from adjacent timestamp deltas,
reversed conversations are flipped, and the stable (conv, turn) order is
reassembled.  Physically: ``groupby(key).map_groups`` — a hash shuffle —
with vectorized pandas inside each group.  Skew handling for mega-threads
lives in prlib_ray/state/partitioning.py.

The driver-facing variants run on the ``events`` table (user_id = the
conversation key, ts = the ordering key) so each op has an exact SQL
oracle; the same functions power the transcript flagship.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def reassemble_events(sf_dir: str):
    """deskew core: stable in-conversation ordering.

    seq = rank of the event within its user's stream ordered by
    (ts, event_id) — the `groupby(conv).sort(turn_idx)` reassembly.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def order_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        g = g.reset_index(drop=True)
        g["seq"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["user_id", "event_id", "seq"]]

    return ds.groupby("user_id").map_groups(order_group, batch_format="pandas")


def find_angle_events(sf_dir: str):
    """findAngle analogue (deskew.cpp:139-206): mode vote of the ordering
    direction — +1 if, scanning events in event_id order, ts is
    non-decreasing for at least half of the adjacent pairs, else -1.
    Single-pair-less users (one event) vote +1.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        ts = g["ts"].to_numpy()
        if len(ts) < 2:
            d = 1
        else:
            inc = int((ts[1:] >= ts[:-1]).sum())
            dec = (len(ts) - 1) - inc
            d = 1 if inc >= dec else -1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "direction": [d]})

    out = ds.groupby("user_id").map_groups(vote, batch_format="pandas")
    return out


def find_orientation_events(sf_dir: str):
    """findOrientation analogue (deskew.cpp:70-136): coarse flip check —
    180 when the first event (by event_id) has a later ts than the last,
    else 0."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def orient(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        first, last = g["ts"].iloc[0], g["ts"].iloc[-1]
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "orientation": [180 if first > last else 0],
            }
        )

    return ds.groupby("user_id").map_groups(orient, batch_format="pandas")


def rotate_events(sf_dir: str):
    """rotate analogue (rotate.cpp:35-72): apply the detected permutation —
    users with orientation 180 get their seq reversed (exact transpose/flip
    path), others keep it (identity; the warpAffine path is the transcript
    pipeline's span re-layout)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def rot(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort").reset_index(drop=True)
        n = len(g)
        seq = np.arange(1, n + 1, dtype=np.int64)
        if g["ts"].iloc[0] > g["ts"].iloc[-1]:
            seq = seq[::-1].copy()
        return pd.DataFrame(
            {"user_id": g["user_id"], "event_id": g["event_id"], "seq": seq}
        )

    return ds.groupby("user_id").map_groups(rot, batch_format="pandas")


def deskew_events(sf_dir: str):
    """deskew composite (deskew.cpp:208-251): findAngle -> rotate ->
    findOrientation -> final order.  Emits the corrected stable sequence:
    events ranked by (ts, event_id), flipped when the majority direction
    (scanning event_id order) is decreasing."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def fix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        if len(ts) < 2:
            direction = 1
        else:
            inc = int((ts[1:] >= ts[:-1]).sum())
            direction = 1 if inc >= (len(ts) - 1) - inc else -1
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        n = len(g)
        seq = np.arange(1, n + 1, dtype=np.int64)
        if direction < 0:
            seq = seq[::-1].copy()
        return pd.DataFrame(
            {"user_id": g["user_id"], "event_id": g["event_id"], "seq": seq}
        )

    return ds.groupby("user_id").map_groups(fix, batch_format="pandas")
