"""Sources/sinks: readers and builders for the engine's input tables."""
