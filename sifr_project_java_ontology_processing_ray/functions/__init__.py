"""Pure kernels — no Ray imports. Everything here is deterministic and
unit-testable in-process; the ``stages`` package wraps these into
``map_batches`` callables."""
