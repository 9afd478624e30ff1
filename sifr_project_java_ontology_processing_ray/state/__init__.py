"""Cross-stage state: broadcast dimension tables, union-find, partition
manifests. Replaces the reference's Redis/SQL service layer and shared
mutable model (SURVEY §1.1: Redis memo cache → precomputed joins; pending
accumulators → delta datasets)."""
