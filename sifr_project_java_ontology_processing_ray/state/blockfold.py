"""Raw-task folds over a materialized Dataset's blocks — the iterative
broadcast-loop accelerator.

The broadcast-loop pattern (state as driver arrays shipped via ``ray.put``,
one streaming pass per round) already avoids per-round shuffles, but each
round still paid a full Ray Data execution (operator graph build, executor
spin-up, streaming bookkeeping) — measured ~0.3–0.4 s of fixed cost per
round against ~50 ms of actual scan at sf0.1, i.e. 10-round loops spent
3–4 s on scaffolding. For a loop whose input blocks are ALREADY
materialized and whose per-round output is node-sized, plain ray tasks
over the block refs express the same scan with ~10 ms of dispatch.

This is the documented drop-to-raw-tasks case: the Dataset API can express
one round, but not "N rounds over the same immutable blocks without
rebuilding the pipeline N times". Backpressure isn't bypassed — the input
is materialized (object-store-resident) and per-task results are
node-sized partials.

Block refs stay owned by the MaterializedDataset: hold the dataset object
alive for as long as the refs are used (every caller loops within the
dataset's scope).
"""

from __future__ import annotations

from typing import Callable

_REMOTE_CACHE: dict = {}


def block_ref_groups(ds, max_groups: int | None = None) -> list[list]:
    """Coalesced block-ref groups of a MATERIALIZED dataset, ≤
    ``max_groups`` (default 2×cluster CPUs) groups in block order — one
    raw task per group keeps per-round task count bounded however many
    small blocks the upstream read produced."""
    import ray

    refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return []
    if max_groups is None:
        max_groups = 2 * int(ray.cluster_resources().get("CPU", 8))
    n = max(1, min(len(refs), max_groups))
    step = -(-len(refs) // n)
    return [refs[i : i + step] for i in range(0, len(refs), step)]


def cached_remote(fn: Callable, num_cpus: float = 1):
    """``ray.remote``-wrap ``fn`` once per driver process (a fresh wrapper
    per call would re-export the function every round)."""
    import ray

    key = (fn.__module__, fn.__qualname__, num_cpus)
    if key not in _REMOTE_CACHE:
        _REMOTE_CACHE[key] = ray.remote(num_cpus=num_cpus)(fn)
    return _REMOTE_CACHE[key]


def fold_blocks(fn: Callable, groups: list[list], *args):
    """One round: ``fn(block_refs, *args)`` per group as raw tasks;
    returns the per-group results (commutative partials — fold in any
    order). ``fn`` must ``ray.get`` its ref list itself (refs nested in a
    list are not auto-dereferenced; the local ``get`` is zero-copy)."""
    import ray

    task = cached_remote(fn)
    return ray.get([task.remote(grp, *args) for grp in groups])
