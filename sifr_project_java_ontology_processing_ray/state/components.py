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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64

NUM_SALTS = 16

# Below this node count the label table rides the object store as a numpy
# blob (8 B/node → 64 MB at the limit) and the per-round exchange is ONE
# map execution + a node-sized driver fold — the repo's standard
# small-side dichotomy (pipelines/graph.py uses the same shape for
# PageRank). Lower than graph.py's BROADCAST_NODE_LIMIT because CC nodes
# are strings: the driver additionally holds the sorted node array
# (arrow buffer, ~30 B/node → ~250 MB at this limit). Above it the fully
# shuffled join+Min loop runs; the two paths are pinned equal by test.
CC_BROADCAST_NODE_LIMIT = 8_000_000

# Below this edge count the node seed folds on the driver from streamed
# per-batch uniques instead of a bucketed distinct shuffle; the pull volume
# (Σ per-batch unique ≤ 2·edges) is what the gate bounds, NOT the final
# node count — an open-vocabulary graph with few nodes but 10^12 edges must
# still seed via the shuffle.
CC_EDGE_FOLD_LIMIT = 10_000_000


def _sorted_array(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Sort an arrow (chunked) array and normalize to a single chunk —
    shared by both _cc_broadcast entry branches so chunk handling can't
    drift between them."""
    out = pc.take(arr, pc.sort_indices(arr))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def dedup_edges_salted(edges: "rd.Dataset", num_salts: int = NUM_SALTS) -> "rd.Dataset":
    """Distinct undirected (a, b) edges via per-batch dedup → ONE salted
    groupby. Input columns: a, b (strings).

    The salt is a deterministic function of the normalized ``b``, so every
    copy of a given (a, b) pair lands in the SAME (a, salt) bucket and one
    salted pass already achieves the exact global distinct — no unsalted
    finishing pass (a second all-to-all) is needed. The salt's job is skew
    only: a hot node's edge list (many DISTINCT b's) splits across S
    parallel groups instead of concentrating in one."""

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

    salted = bucketed_map_groups(
        edges.map_batches(norm_batch, batch_format="pyarrow"),
        ["a", "salt"],
        lambda df: df.drop_duplicates(["a", "b"]),
    )
    return salted.map_batches(
        lambda b: b.drop_columns(["salt"]), batch_format="pyarrow"
    )


def connected_components(
    edges: "rd.Dataset",
    max_rounds: int = 8,
    check_fixpoint: bool = True,
    broadcast_limit: int = CC_BROADCAST_NODE_LIMIT,
    edge_fold_limit: int = CC_EDGE_FOLD_LIMIT,
    checkpoint_dir: "str | None" = None,
) -> "rd.Dataset":
    """(a, b) edge Dataset → (node, label) Dataset, label = lexicographic
    min of the node's component. Deterministic; ``max_rounds`` bounds the
    component diameter handled (raise for chain-shaped graphs).
    ``broadcast_limit`` gates the small-node-table broadcast loop
    (``_cc_broadcast``); ``edge_fold_limit`` gates the driver-fold node
    seed. Pass 0 for both to force the fully shuffled path.

    ``checkpoint_dir``: persist the label state per completed round and
    resume from the highest one (state/checkpoints.py — npy on the
    broadcast path, parquet + marker on the shuffle path); a fixpoint
    exit writes a ``_converged`` marker so a resumed run skips the loop
    entirely. Resumed output is bit-identical to an uninterrupted run
    (min-label propagation is monotone in the label state, so rounds
    compose)."""

    import ray.data as rd
    from ray.data.aggregate import Min

    from .grouped import bucketed_map_groups, dataset_from_table
    from .partitions import join_partitions

    # edges are rescanned by the node seed AND the sym/encode pass (and the
    # shuffle loop's rounds) — materialize ONCE or the whole upstream
    # pipeline (e.g. the caller's bucketed edge build) re-executes per scan
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "label": pa.array([], pa.string())})
        )

    def seed_nodes(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        nodes = pd.unique(pd.concat([df["a"], df["b"]], ignore_index=True))
        return pa.table({"node": pa.array(list(nodes), pa.string())})

    nodes_sorted = None
    if n_edges <= edge_fold_limit:
        # driver-fold seed: stream per-batch unique nodes and dedupe once
        # on the driver (arrow buffers, no python strings). Pull volume is
        # Σ per-batch uniques ≤ 2·n_edges — gated by the EDGE count, which
        # also bounds the transient concat (≤ ~20M strings at the limit)
        parts: list[pa.Array] = []
        for b in edges.map_batches(
            seed_nodes, batch_format="pyarrow", batch_size=262144
        ).iter_batches(batch_format="pyarrow"):
            if b.num_rows and "node" in b.column_names:
                parts.append(b["node"].combine_chunks())
        uniq = pc.unique(pa.chunked_array(parts))
        nodes_sorted = _sorted_array(uniq)
        if len(nodes_sorted) <= broadcast_limit:
            return _cc_broadcast(edges, nodes_sorted, max_rounds, checkpoint_dir)
        labels = dataset_from_table(
            pa.table({"node": nodes_sorted, "label": nodes_sorted})
        ).materialize()
    else:
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
        n_nodes = labels.count()
        if n_nodes == 0:
            return labels
        if n_nodes <= broadcast_limit:
            col = pa.array(labels.to_pandas()["node"], pa.string())
            return _cc_broadcast(edges, _sorted_array(col), max_rounds, checkpoint_dir)

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

    from . import checkpoints as ckpts

    start, ckpt = ckpts.resume_round(checkpoint_dir, max_rounds, "parquet")
    if ckpt:
        from ..sources import parquet_io as pio

        labels = pio.read_parquet(ckpt).materialize()
        done = ckpts.converged_round(checkpoint_dir)
        if done is not None and done <= start:
            return labels

    for round_idx in range(start, max_rounds):
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

        if checkpoint_dir:
            ckpts.save_parquet(checkpoint_dir, round_idx + 1, new_labels)

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
                ckpts.mark_converged(checkpoint_dir, round_idx + 1)
                break
        else:
            labels = new_labels
    return labels


def _cc_pmin_blocks(refs, lb):
    """One block group's min-label partial over integer-encoded sym edges:
    min(label[pi]) per ni. Raw task (state/blockfold); returns (ni, m)
    numpy pair, group-combined."""
    import ray

    out_n, out_m = [], []
    for blk in ray.get(refs):
        if blk.num_rows == 0:
            continue
        pi = blk["pi"].to_numpy(zero_copy_only=False)
        t = pa.table({"ni": blk["ni"], "m": pa.array(lb[pi], pa.int64())})
        g = t.group_by("ni").aggregate([("m", "min")])
        out_n.append(g["ni"].to_numpy(zero_copy_only=False))
        out_m.append(g["m_min"].to_numpy(zero_copy_only=False))
    if not out_n:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    alln = np.concatenate(out_n)
    allm = np.concatenate(out_m)
    u, inv = np.unique(alln, return_inverse=True)
    m = np.full(len(u), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(m, inv, allm)
    return u, m


def _cc_broadcast(
    edges: "rd.Dataset",
    nodes: pa.Array,
    max_rounds: int,
    checkpoint_dir: "str | None" = None,
) -> "rd.Dataset":
    """Broadcast-side min-label propagation: node labels live as a numpy
    index array on the driver, shipped via ``ray.put`` each round; edges
    stay distributed and are scanned once per round. Gated by
    ``CC_BROADCAST_NODE_LIMIT`` (the caller checked).

    One round = ONE streaming execution — integer-encoded edge scan →
    per-batch grouped Min partials (arrow kernel) → node-sized driver fold
    (``np.minimum.at``, order-independent) — which sidesteps the per-round
    hash-join + aggregate actor-fleet fixed cost that dominates the shuffle
    loop at small edge counts (measured 43.7 s → ~6 s for 3 rounds over
    98.5k edges at sf0.1). Labels are indices into the SORTED node array,
    so integer Min ≡ the shuffle path's lexicographic-utf8 Min (UTF-8 byte
    order equals code-point order); the converged outputs are byte-equal
    (pinned by tests/test_kg_pipeline.py).

    Driver-fold volume per round is bounded by Σ per-block unique node
    count — the same trade ``pipelines/graph._pagerank_broadcast``
    documents; the shuffle loop above remains the open-vocabulary path.
    """
    import ray

    from .broadcast import cached_get
    from .grouped import dataset_from_table

    n = len(nodes)  # SORTED node array, gate-bounded by the caller
    nodes_ref = ray.put(nodes)

    def encode_sym(b: pa.Table, _ref=nodes_ref) -> pa.Table:
        # integer-encode BOTH edge directions in one pass (the sym table
        # fused with the encode); index_in is a C++ hash probe against the
        # plasma-resident node array — no python strings on workers
        vs = cached_get(_ref)
        ai = pc.cast(pc.index_in(b["a"], value_set=vs), pa.int64())
        bi = pc.cast(pc.index_in(b["b"], value_set=vs), pa.int64())
        return pa.concat_tables(
            [pa.table({"ni": ai, "pi": bi}), pa.table({"ni": bi, "pi": ai})]
        )

    enc = edges.map_batches(
        encode_sym, batch_format="pyarrow", batch_size=262144
    ).materialize()

    from . import checkpoints as ckpts

    labels_idx = np.arange(n, dtype=np.int64)
    start, ckpt = ckpts.resume_round(checkpoint_dir, max_rounds, "npy")
    if ckpt:
        labels_idx = np.load(ckpt)
        done = ckpts.converged_round(checkpoint_dir)
        if done is not None and done <= start:
            start = max_rounds  # terminal state: skip the loop
    # rounds run as raw-task folds over the materialized encoded blocks
    # (state/blockfold): the per-round Dataset execution paid ~0.3-0.4 s
    # of executor fixed cost against ~50 ms of scan
    from .blockfold import block_ref_groups, fold_blocks

    groups = block_ref_groups(enc)
    for round_idx in range(start, max_rounds):
        lab_ref = ray.put(labels_idx)

        new = labels_idx.copy()
        for part_n, part_m in fold_blocks(_cc_pmin_blocks, groups, lab_ref):
            if len(part_n):
                np.minimum.at(new, part_n, part_m)
        if checkpoint_dir:
            ckpts.save_npy(checkpoint_dir, round_idx + 1, new)
        if np.array_equal(new, labels_idx):
            ckpts.mark_converged(checkpoint_dir, round_idx + 1)
            break  # fixpoint check is free here — identical output either way
        labels_idx = new

    return dataset_from_table(
        pa.table({"node": nodes, "label": pc.take(nodes, pa.array(labels_idx))})
    )
