"""Named side-count channel for data-quality counters that must reach the
DRIVER, not just worker logs (ADVICE r3: read_rdf's skipped-file count was
log-only, so a caller could not distinguish a clean read from one that
dropped files).

A zero-CPU named actor per channel; parse tasks fire-and-forget increments
only when a count is non-zero, so the hot path pays nothing. The actor's
lifetime is the driver's (not detached) — counts are per-run, like the
reference's OntologyStats counters (stats/OntologyStats.java:15-111).
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self._c: dict[str, int] = {}
        self._seen: set[str] = set()

    def add(self, key: str, n: int = 1) -> None:
        self._c[key] = self._c.get(key, 0) + n

    def add_once(self, dedup_key: str, items: dict) -> None:
        """Idempotent add: a lazy Dataset re-executes its tasks on every
        consumption (and Ray retries re-run them after a worker crash), so
        side-effect increments double-count unless keyed. ``dedup_key``
        identifies the logical work unit (e.g. the input file); repeats
        are dropped. Seen-set size is O(#work units) — file-count bounded."""
        if dedup_key in self._seen:
            return
        self._seen.add(dedup_key)
        for key, n in items.items():
            self._c[key] = self._c.get(key, 0) + n

    def get(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c = {}
        self._seen = set()


# Handle retention: a NAMED but non-detached actor is garbage-collected as
# soon as the last live handle drops, so a function-local handle (create →
# add → return) silently destroys the channel between calls and every later
# caller gets a FRESH empty actor. Each process (driver and workers) pins
# the handles it has seen for its own lifetime; the driver's pin — made at
# read construction, see read_rdf — is what keeps the channel alive across
# the run. Keys include the local node id — random per cluster start — so
# an in-process ray.shutdown()/ray.init() (notebooks, embedded runs) gets
# FRESH actors instead of stale handles to the dead cluster's actors. (The
# job id is unsuitable: a fresh local cluster restarts its job counter, so
# the id collides across restarts.)
_CHANNELS: dict[tuple[str, str], "ray.actor.ActorHandle"] = {}


def counter_channel(name: str):
    """Get-or-create the named counter actor for ``name`` (handle pinned
    for this process's lifetime within the current Ray cluster)."""
    key = (ray.get_runtime_context().get_node_id(), name)
    if key not in _CHANNELS:
        _CHANNELS[key] = _CounterActor.options(
            name=f"graft_counters::{name}", get_if_exists=True
        ).remote()
    return _CHANNELS[key]


def side_counts(name: str) -> dict[str, int]:
    """Read the current counts for channel ``name`` (driver-side)."""
    return ray.get(counter_channel(name).get.remote())


def reset_counts(name: str) -> None:
    ray.get(counter_channel(name).reset.remote())
