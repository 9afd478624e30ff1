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
        return pa.Table.from_pandas(out, preserve_index=False)

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    salted = (
        edges.map_batches(norm_batch, batch_format="pyarrow")
        .groupby(["a", "salt"])
        .map_groups(dedup_group, batch_format="pandas")
    )
    return (
        salted.groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .drop_columns(["salt"])
    )


def connected_components(
    edges: "rd.Dataset", max_rounds: int = 8, check_fixpoint: bool = True
) -> "rd.Dataset":
    """(a, b) edge Dataset → (node, label) Dataset, label = lexicographic
    min of the node's component. Deterministic; ``max_rounds`` bounds the
    component diameter handled (raise for chain-shaped graphs)."""

    def seed_labels(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        return pa.Table.from_pandas(
            pd.DataFrame({"node": nodes, "label": nodes}), preserve_index=False
        )

    labels = (
        edges.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    ).materialize()

    # symmetric message edges (node ← peer)
    def sym(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.concat(
            [df.rename(columns={"a": "node", "b": "peer"}),
             df.rename(columns={"b": "node", "a": "peer"})[["node", "peer"]]],
            ignore_index=True,
        )
        return pa.Table.from_pandas(out[["node", "peer"]], preserve_index=False)

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        # 1) attach each node's label to messages addressed to its peers:
        #    group (sym_edges ∪ labels) by node → emit (peer, label(node))
        def outbox(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["kind"] == "label", "payload"]
            if lab.empty:
                return pd.DataFrame({"node": [], "label": []})
            label = lab.min()
            peers = g.loc[g["kind"] == "edge", "payload"]
            return pd.DataFrame({"node": list(peers), "label": [label] * len(peers)})

        tagged_edges = sym_edges.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "kind": pa.array(["edge"] * b.num_rows),
                 "payload": b["peer"]}
            ),
            batch_format="pyarrow",
        )
        tagged_labels = labels.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "kind": pa.array(["label"] * b.num_rows),
                 "payload": b["label"]}
            ),
            batch_format="pyarrow",
        )
        messages = tagged_edges.union(tagged_labels).groupby("node").map_groups(
            outbox, batch_format="pandas"
        )

        # 2) new label = min(incoming labels ∪ own label)
        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": [g["node"].iloc[0]], "label": [g["label"].min()]}
            )

        new_labels = (
            messages.union(labels)
            .groupby("node")
            .map_groups(reduce_min, batch_format="pandas")
        ).materialize()

        # fixpoint check pulls the node-label table to the driver — fine
        # for dimension-sized graphs; for huge graphs pass
        # check_fixpoint=False and size max_rounds to the graph diameter
        if check_fixpoint:
            old = labels.to_pandas().set_index("node")["label"]
            new = new_labels.to_pandas().set_index("node")["label"]
            labels = new_labels
            if old.sort_index().equals(new.sort_index()):
                break
        else:
            labels = new_labels
    return labels
