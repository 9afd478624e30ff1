"""map_batches callables: stateless batch functions and stateful actor
classes. All operate on ``batch_format="pyarrow"`` unless noted."""
