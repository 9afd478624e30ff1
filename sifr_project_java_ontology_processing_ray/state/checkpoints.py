"""Round-granular checkpoint/resume for iterative loops (north rule:
resumable from checkpoint). Shared by PageRank, connected components and
BFS — each loop persists its node-sized state after every completed round
and resumes from the highest completed one.

Two payload formats, matched to the two execution paths every loop has:
- ``.npy`` (broadcast path): the driver-side numpy state, written
  atomically via rename — existence IS completion.
- parquet directory (shuffle path): the distributed state table, written
  by the cluster; a ``_complete`` marker lands AFTER the data so a torn
  write is never resumed from.

A ``_converged`` marker (written when a fixpoint loop exits early) records
the terminal round so a resumed run skips the loop entirely instead of
re-running rounds that provably change nothing. float64/int64 round-trip
losslessly through both formats, so a resumed run is bit-identical to an
uninterrupted one (pinned by tests)."""

from __future__ import annotations

import os

import numpy as np


def npy_path(d: str, k: int) -> str:
    return os.path.join(d, f"round_{k}.npy")


def parquet_path(d: str, k: int) -> str:
    return os.path.join(d, f"round_{k}")


def resume_round(d: str | None, max_round: int, fmt: str) -> tuple[int, str | None]:
    """(start_round, payload_path): highest completed round ≤ max_round
    under ``d`` (0, None = cold start). ``fmt``: 'npy' | 'parquet'."""
    if not d:
        return 0, None
    for k in range(max_round, 0, -1):
        if fmt == "npy":
            p = npy_path(d, k)
            if os.path.exists(p):
                return k, p
        else:
            p = parquet_path(d, k)
            if os.path.exists(os.path.join(p, "_complete")):
                return k, p
    return 0, None


def save_npy(d: str, k: int, arr: np.ndarray) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".round_{k}.npy.tmp")
    with open(tmp, "wb") as f:  # np.save(path) would append .npy
        np.save(f, arr)
    os.replace(tmp, npy_path(d, k))


def save_parquet(d: str, k: int, ds) -> None:
    """Write a (materialized) Dataset as round ``k``'s state. Idempotent:
    an already-complete round is left untouched (resume path re-saves the
    round it loaded)."""
    p = parquet_path(d, k)
    marker = os.path.join(p, "_complete")
    if os.path.exists(marker):
        return
    ds.write_parquet(p)
    with open(marker, "w") as f:
        f.write("ok\n")


def mark_converged(d: str | None, k: int) -> None:
    if not d:
        return
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "_converged"), "w") as f:
        f.write(f"{k}\n")


def converged_round(d: str | None) -> int | None:
    if not d:
        return None
    p = os.path.join(d, "_converged")
    try:
        with open(p) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None
