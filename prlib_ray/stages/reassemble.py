"""Reassembly family (reference: src/deskew/deskew.cpp, rotate.cpp) — the
engine's one wide (shuffle) step.

Reference semantics: ``findAngle`` mode-votes the dominant line angle
(deskew.cpp:172-201), ``findOrientation`` detects coarse 0/90/180/270
flips (deskew.cpp:70-136), ``rotate`` applies the permutation
(rotate.cpp:35-72), ``deskew`` composes all three (deskew.cpp:208-251).

Transcript analogue: a conversation's turns arrive out of order; the
dominant ordering direction is mode-voted from adjacent timestamp deltas,
reversed conversations are flipped, and the stable (conv, turn) order is
reassembled.

Physically: users hash into ``N_REASSEMBLE_PARTS`` coarse partitions and
ONE vectorized run-boundary pass handles every user in a part — never a
per-user Ray group (per-group scheduling costs ~5-10 ms/key: sessionize
measured 11.8 s -> ~1 s at 1,500 users when coarsened; at 10^6+ users
per-key grouping is a scale-killer).  Skew handling for mega-threads
lives in prlib_ray/state/partitioning.py.

The driver-facing variants run on the ``events`` table (user_id = the
conversation key, ts = the ordering key) so each op has an exact SQL
oracle; the same functions power the transcript flagship.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from prlib_ray.blocks import int_bincount

N_REASSEMBLE_PARTS = 32  # coarse user partitions; raise for 10^9+ users


def _events_by_part(sf_dir: str):
    """events pruned to (event_id, ts, user_id) + the coarse part key."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def add_part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy().astype(np.int64)
        return b.append_column(
            "part", pa.array(u % N_REASSEMBLE_PARTS)
        )

    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True)


def _runs(user_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(run id per row, run start indices, run lengths) of a user-sorted
    array — the shared run-boundary decomposition."""
    new = np.r_[True, user_sorted[1:] != user_sorted[:-1]]
    run = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    lens = np.diff(np.r_[starts, len(user_sorted)])
    return run, starts, lens


def _directions(user_s, ts_s, run, starts, lens):
    """Per-run majority direction in event_id order (the inputs must be
    lexsorted by (event_id, user)): +1 iff non-decreasing adjacent ts
    pairs are at least half.  Single-event runs vote +1."""
    inc = np.zeros(len(starts), dtype=np.int64)
    if len(user_s) > 1:
        same = user_s[1:] == user_s[:-1]
        nondec = (ts_s[1:] >= ts_s[:-1]) & same
        inc = int_bincount(run[1:][same], nondec[same],
                           minlength=len(starts))
    npairs = lens - 1
    return np.where(2 * inc >= npairs, 1, -1).astype(np.int64)


def reassemble_events(sf_dir: str):
    """deskew core: stable in-conversation ordering.

    seq = rank of the event within its user's stream ordered by
    (ts, event_id) — the `groupby(conv).sort(turn_idx)` reassembly.
    """

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()), "event_id": pa.array([], type=pa.int64()), "seq": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u_s, e_s = user[order], eid[order]
        _, starts, lens = _runs(u_s)
        seq = (np.arange(len(u_s), dtype=np.int64)
               - np.repeat(starts, lens) + 1)
        return pa.table({"user_id": pa.array(u_s),
                         "event_id": pa.array(e_s),
                         "seq": pa.array(seq)})

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def find_angle_events(sf_dir: str):
    """findAngle analogue (deskew.cpp:139-206): mode vote of the ordering
    direction — +1 if, scanning events in event_id order, ts is
    non-decreasing for at least half of the adjacent pairs, else -1.
    Single-pair-less users (one event) vote +1.
    """

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()), "direction": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, user))
        u_s, t_s = user[order], ts[order]
        run, starts, lens = _runs(u_s)
        d = _directions(u_s, t_s, run, starts, lens)
        return pa.table({"user_id": pa.array(u_s[starts]),
                         "direction": pa.array(d)})

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def find_orientation_events(sf_dir: str):
    """findOrientation analogue (deskew.cpp:70-136): coarse flip check —
    180 when the first event (by event_id) has a later ts than the last,
    else 0."""

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()), "orientation": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, user))
        u_s, t_s = user[order], ts[order]
        _, starts, lens = _runs(u_s)
        first, last = t_s[starts], t_s[starts + lens - 1]
        return pa.table(
            {
                "user_id": pa.array(u_s[starts]),
                "orientation": pa.array(
                    np.where(first > last, 180, 0).astype(np.int64)),
            }
        )

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def rotate_events(sf_dir: str):
    """rotate analogue (rotate.cpp:35-72): apply the detected permutation —
    users with orientation 180 get their seq reversed (exact transpose/flip
    path), others keep it (identity; the warpAffine path is the transcript
    pipeline's span re-layout)."""

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()), "event_id": pa.array([], type=pa.int64()), "seq": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, user))
        u_s, e_s, t_s = user[order], eid[order], ts[order]
        run, starts, lens = _runs(u_s)
        pos = np.arange(len(u_s), dtype=np.int64) - np.repeat(starts, lens)
        flip = t_s[starts] > t_s[starts + lens - 1]
        n_of = np.repeat(lens, lens)
        seq = np.where(np.repeat(flip, lens), n_of - pos, pos + 1)
        return pa.table({"user_id": pa.array(u_s),
                         "event_id": pa.array(e_s),
                         "seq": pa.array(seq)})

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def deskew_events(sf_dir: str):
    """deskew composite (deskew.cpp:208-251): findAngle -> rotate ->
    findOrientation -> final order.  Emits the corrected stable sequence:
    events ranked by (ts, event_id), flipped when the majority direction
    (scanning event_id order) is decreasing."""

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()), "event_id": pa.array([], type=pa.int64()), "seq": pa.array([], type=pa.int64())})
        user = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # pass 1: direction vote in event_id order
        o1 = np.lexsort((eid, user))
        run, starts, lens = _runs(user[o1])
        d = _directions(user[o1], ts[o1], run, starts, lens)
        # pass 2: rank by (ts, event_id); same run layout (stable lexsort
        # keyed by user first => identical run starts/lengths)
        o2 = np.lexsort((eid, ts, user))
        u_s, e_s = user[o2], eid[o2]
        pos = np.arange(len(u_s), dtype=np.int64) - np.repeat(starts, lens)
        n_of = np.repeat(lens, lens)
        seq = np.where(np.repeat(d, lens) < 0, n_of - pos, pos + 1)
        return pa.table({"user_id": pa.array(u_s),
                         "event_id": pa.array(e_s),
                         "seq": pa.array(seq)})

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )
