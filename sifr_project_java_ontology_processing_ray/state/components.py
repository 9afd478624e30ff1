"""Distributed connected components via iterative min-label propagation —
the general-case canonicalization path (north rule: distributed union-find
over a salted groupby shuffle).

The flagship pipeline's edge set is dictionary-bounded, so it merges in one
driver pass (state/unionfind.py). When the edge set is NOT driver-sized
(open-vocabulary entities), use this: the same deterministic result,
computed with Ray groupbys only.

Algorithm (classic label propagation):
  labels ← {node: node}
  repeat: every node's label ← min(own label, labels of neighbours)
  until fixpoint (components of diameter d converge in ≤ d rounds; each
  round is two groupby exchanges).

Skew handling: edge dedup before the loop uses a SALTED groupby —
key = (node, hash(peer) % S) — so a hot node's edge list is deduped in S
parallel groups before the unsalted pass; inside the loop each node's
message group is capped by its distinct-neighbour count (already deduped).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64

NUM_SALTS = 16


def dedup_edges_salted(edges: "rd.Dataset", num_salts: int = NUM_SALTS) -> "rd.Dataset":
    """Distinct undirected (a, b) edges via per-batch dedup → salted
    groupby → unsalted groupby. Input columns: a, b (strings)."""

    def norm_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lo = df[["a", "b"]].min(axis=1)
        hi = df[["a", "b"]].max(axis=1)
        out = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
        out["salt"] = [hash64(x) % num_salts for x in out["b"]]
        # strip the b'pandas' schema metadata or every downstream shuffle
        # block ships a distinct unhashable schema (SCALE.md r4 finding)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    from .grouped import bucketed_map_groups

    # two bucketed distinct passes (vectorized inside each bucket) — NOT
    # per-key map_groups: the salted pass splits a hot node's edge list
    # into S groups, the unsalted pass finishes the global distinct
    salted = bucketed_map_groups(
        edges.map_batches(norm_batch, batch_format="pyarrow"),
        ["a", "salt"],
        lambda df: df.drop_duplicates(["a", "b"]),
    )
    return bucketed_map_groups(
        salted.map_batches(
            lambda b: b.drop_columns(["salt"]), batch_format="pyarrow"
        ),
        ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]),
    )


def connected_components(
    edges: "rd.Dataset", max_rounds: int = 8, check_fixpoint: bool = True
) -> "rd.Dataset":
    """(a, b) edge Dataset → (node, label) Dataset, label = lexicographic
    min of the node's component. Deterministic; ``max_rounds`` bounds the
    component diameter handled (raise for chain-shaped graphs)."""

    from ray.data.aggregate import Min

    from .grouped import bucketed_map_groups
    from .partitions import join_partitions


    def seed_nodes(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        return pa.table({"node": pa.array(list(nodes), pa.string())})

    # distinct nodes via per-batch combiner + bucketed distinct (NOT
    # per-key map_groups — that is one python call per node)
    labels = (
        bucketed_map_groups(
            edges.map_batches(seed_nodes, batch_format="pyarrow"),
            ["node"],
            lambda df: df.drop_duplicates(),
        )
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # symmetric message edges (node ← peer)
    def sym(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.concat(
            [df.rename(columns={"a": "node", "b": "peer"}),
             df.rename(columns={"b": "node", "a": "peer"})[["node", "peer"]]],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            out[["node", "peer"]], preserve_index=False
        ).replace_schema_metadata(None)

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    _EMPTY_LABELS = pa.table(
        {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}
    )

    # label-flow join parallelism: cluster-derived, capped by the edge
    # count (metadata-cheap on the materialized sym_edges)
    _n_join = join_partitions(rows=sym_edges.count())

    def _norm(b: pa.Table) -> pa.Table:
        # Ray's hash join/aggregate emit ZERO-COLUMN blocks for empty hash
        # partitions; a downstream arrow join crashes on them ("no match
        # for key field"). An EXPLICIT batch_size on the maps below makes
        # Ray's batcher coalesce blocks (dropping the schema-less
        # empties) instead of passing blocks through untouched — without
        # it, map_batches never calls the UDF on an empty block at all.
        if b.num_rows == 0 or "node" not in b.column_names:
            return _EMPTY_LABELS
        return b.select(["node", "label"])

    for round_idx in range(max_rounds):
        # 1) each node's label flows to its peers: a hash JOIN of the edge
        #    list against the label table (vectorized all the way — the
        #    round-2 implementation grouped per node in python)
        messages = sym_edges.join(
            labels, join_type="inner", num_partitions=_n_join, on=("node",)
        ).map_batches(
            lambda b: _EMPTY_LABELS
            if b.num_rows == 0 or "peer" not in b.column_names
            else pa.table({"node": b["peer"], "label": b["label"]}),
            batch_format="pyarrow",
            batch_size=262144,
        )

        # 2) new label = min(incoming labels ∪ own label): native grouped
        #    Min aggregate (arrow kernel), no per-key python
        new_labels = (
            messages.union(labels)
            # same cluster/row-derived parallelism as the label-flow join:
            # the default partition count spawns a fresh aggregator-actor
            # fleet per round, a pure fixed cost at small edge counts
            .groupby("node", num_partitions=_n_join)
            .aggregate(Min("label", alias_name="label"))
            .map_batches(_norm, batch_format="pyarrow", batch_size=262144)
        ).materialize()

        # round 0 always changes labels on any non-trivial graph — skip
        # its fixpoint job (one fewer distributed round trip)
        if check_fixpoint and round_idx > 0:
            # distributed fixpoint test: count changed labels via a join —
            # only a scalar reaches the driver. Suffixed join directly on
            # the two materialized label tables (an intermediate rename
            # map_batches emitted schema-less empty blocks that crashed
            # the join's arrow finalize on empty hash partitions).
            changed = (
                labels.join(
                    new_labels, join_type="inner", num_partitions=_n_join,
                    on=("node",), left_suffix="_old", right_suffix="_new",
                )
                .map_batches(
                    lambda b: b.filter(pc.not_equal(b["label_old"], b["label_new"])),
                    batch_format="pyarrow",
                )
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels
