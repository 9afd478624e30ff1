"""Broadcast small dimension tables: ``ray.put`` once on the driver, read
once per actor/task via the object store (zero re-shipping per batch).

≙ the reference's SQLUMLSDelegate + Redis cache (SQLUMLSDelegate.java:32-40):
lookup tables are data, not services.
"""

from __future__ import annotations

from typing import Any

import ray


class Broadcast:
    """Wrapper around an ObjectRef that materializes lazily inside workers.

    Usage::

        bc = Broadcast.put(big_dict)            # driver, once
        ds.map_batches(Stage, fn_constructor_args=(bc,), ...)
        # in Stage.__init__(self, bc): self.table = bc.value
    """

    def __init__(self, ref: "ray.ObjectRef"):
        self._ref = ref

    @classmethod
    def put(cls, obj: Any) -> "Broadcast":
        return cls(ray.put(obj))

    @property
    def value(self) -> Any:
        # ray.get on an already-local object is a cheap shared-memory read;
        # workers on the same node share one copy in the object store.
        return ray.get(self._ref)
