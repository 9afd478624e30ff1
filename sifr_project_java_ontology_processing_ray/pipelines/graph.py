"""Distributed graph analytics over materialized adjacency tables.

The north rule's kg_construct tier materializes the KG as a partitioned
``(subj, pred, obj)`` adjacency table (``pipelines/kg.py``); this module
adds the downstream iterative-analytics family over such tables — the
canonical consumer of a graph materialize. PageRank is implemented as k
fixed iterations of the standard distributed pattern:

    ranks_{k+1} = (edges ⋈ ranks_k on src) → emit (dst, rank/out_deg)
                  ∪ zero-rows for every node      # outer-join-free
                  → groupby(node).sum             # one shuffle per iter
                  → (1-d)/N + d·(s + dangling/N)  # vectorized rescale

Scale notes (the partitioning contract this relies on):
- ``edges`` is materialized ONCE and re-read from the object store each
  iteration (spillable; never pulled to the driver).
- ``ranks`` is node-sized and re-materialized per iteration — the
  iterative-algorithm checkpoint; join parallelism derives from cluster
  CPUs via ``state.partitions.join_partitions`` (VERDICT r3 #2 pattern).
- The out-degree rides INSIDE the ranks table (union + Max trick below),
  so each iteration costs exactly one hash join + one groupby — no
  second join to re-attach static node metadata.
- The dangling mass is a scalar aggregate over the materialized
  node-sized ranks, not an extra pass over the edge stream.

The reference repo has no graph analytics (its Jena models are driver-
local); this family is part of the engine's LLM-scale extension surface,
verified by an exact unrolled-CTE DuckDB oracle (``SQL_PAGERANK``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..functions.numeric import round_sql
from ..sources import parquet_io as pio
from ..state.partitions import join_partitions

DAMPING = 0.85
ITERS = 5
# l_partkey and l_orderkey share the int64 key space; offset part nodes so
# the bipartite order→part graph has disjoint node ids (same literal in the
# SQL oracles). 2^42 keeps the ids disjoint for orderkeys up to ~4.4e12
# (TPC-H orderkeys pass 10M at SF≈2 — a 1e7 offset would silently alias
# order and part nodes at scale, and the oracle, sharing the literal,
# would agree on the wrong graph) while partkey + offset stays far under
# int64 max.
PART_OFFSET = 1 << 42


def _meta_partials(b: pa.Table) -> pa.Table:
    """Per-batch (node, partial out-degree) rows: source counts + zero-count
    rows for targets, so dst-only (dangling) nodes appear without an outer
    join. ONE pass over the edge stream; consumed by the shuffled groupby
    (``node_meta``) or the driver fold (``_node_meta_fold``)."""
    t = b.group_by("src").aggregate([("dst", "count")])
    srcs = pa.table(
        {"node": t["src"], "oc_p": pc.cast(t["dst_count"], pa.int64())}
    )
    uniq = pc.unique(b["dst"])
    dsts = pa.table(
        {"node": uniq, "oc_p": pa.array(np.zeros(len(uniq), np.int64))}
    )
    return pa.concat_tables([srcs, dsts])


def node_meta(edges: rd.Dataset) -> rd.Dataset:
    """(node, out_cnt) for every node of a distinct (src, dst) edge set,
    via one single-key groupby over the per-batch partials."""
    return (
        edges.map_batches(_meta_partials, batch_format="pyarrow")
        .groupby("node", num_partitions=join_partitions(rows=edges.count()))
        .aggregate(Sum("oc_p", alias_name="out_cnt"))
    )


def _node_meta_fold(edges: rd.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(sorted nodes, out_cnt) folded on the driver from streamed per-batch
    partials — no shuffle, no aggregator-actor fleet. Only called when the
    edge count is gated ≤ ``META_FOLD_EDGE_LIMIT`` (so both the pull volume,
    Σ per-block unique ≤ 2·|edges| rows, and the node arrays are
    driver-safe); the shuffled ``node_meta`` is the open path above it."""
    parts_n: list[np.ndarray] = []
    parts_c: list[np.ndarray] = []
    for b in edges.map_batches(
        _meta_partials, batch_format="pyarrow", batch_size=262144
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or "node" not in b.column_names:
            continue
        parts_n.append(b["node"].to_numpy(zero_copy_only=False).astype(np.int64))
        parts_c.append(b["oc_p"].to_numpy(zero_copy_only=False))
    if not parts_n:
        return np.array([], np.int64), np.array([], np.float64)
    nodes = np.concatenate(parts_n)
    ocs = np.concatenate(parts_c)
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    ocs = ocs[order]
    uniq, idx = np.unique(nodes, return_index=True)
    return uniq, np.add.reduceat(ocs, idx).astype(np.float64)


# above this node count the (node, out_cnt, rank) arrays stop being a
# broadcast-sized side (~24 B/node → ~1.2 GB at the limit); the per-iteration
# shuffle-join path takes over
BROADCAST_NODE_LIMIT = 50_000_000

# above this DISTINCT-edge count the packed (a<<32|b) edge-set array stops
# being a broadcast-sized side (~160 MB at the limit) and triangle_count's
# closing check falls back to the shuffled union-groupby; also requires
# node ids < 2^31 so keys pack into uint64
EDGE_BROADCAST_LIMIT = 20_000_000

# below this edge count node metadata folds on the driver from streamed
# per-batch partials instead of a shuffled groupby (the aggregator-actor
# fleet is a pure fixed cost at small scale — measured 6.0 s for 600k
# edges at sf0.1); nodes ≤ 2·edges, so the fold result is always inside
# BROADCAST_NODE_LIMIT and the broadcast rank path is implied
META_FOLD_EDGE_LIMIT = 10_000_000


def pagerank(
    edges: rd.Dataset,
    damping: float = DAMPING,
    iters: int = ITERS,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """PageRank over a DISTINCT (src:int64, dst:int64) edge Dataset.

    Returns (node, rank_n) where rank_n = rank × N (mean 1.0) — scaled so
    the oracle gate's 6-decimal float rounding keeps full sensitivity on
    graphs with millions of nodes. Semantics: uniform init 1/N, dangling
    mass redistributed uniformly, ``iters`` fixed synchronous iterations.

    Two execution paths with identical results (pinned by test):
    - node table ≤ BROADCAST_NODE_LIMIT: ranks live as driver numpy arrays
      broadcast via ``ray.put`` each round; an iteration is ONE distributed
      execution (edge scan → per-batch partial sums → small groupby →
      node-sized pull). This is the repo's standard small-side pattern and
      dodges the per-op shuffle fixed cost that dominates toy scale.
    - larger: fully shuffled loop (hash join + union-groupby per round,
      ranks re-materialized as the iterative checkpoint) — nothing
      node-sized ever reaches the driver.

    ``checkpoint_dir``: persist the rank state after every completed
    round (npy on the broadcast path, parquet + completion marker on the
    shuffle path) and RESUME from the highest completed round on rerun —
    the north rule's checkpoint/resume contract applied to the iterative
    loop. float64 round-trips losslessly through both formats, so a
    resumed run is bit-identical to an uninterrupted one (pinned by
    test).
    """
    edges = edges.materialize()
    n_edges = edges.count()
    base = (1.0 - damping) if damping != DAMPING else 0.15  # exact literal parity with SQL
    if n_edges <= META_FOLD_EDGE_LIMIT:
        # fold node metadata on the driver — no shuffle; nodes ≤ 2·edges
        # guarantees the broadcast rank path
        nodes, out_cnt = _node_meta_fold(edges)
        if len(nodes) == 0:
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()), "rank_n": pa.array([], pa.float64())})
            )
        return _pagerank_broadcast(
            edges, nodes, out_cnt, float(len(nodes)), base, damping, iters,
            checkpoint_dir,
        )
    meta = node_meta(edges).materialize()
    n = float(meta.count())
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank_n": pa.array([], pa.float64())})
        )
    if n <= BROADCAST_NODE_LIMIT:
        mdf = meta.to_pandas()  # node-sized, gated by BROADCAST_NODE_LIMIT
        nodes = np.ascontiguousarray(mdf["node"].to_numpy(np.int64))
        order = np.argsort(nodes, kind="stable")
        return _pagerank_broadcast(
            edges, nodes[order], mdf["out_cnt"].to_numpy(np.float64)[order],
            n, base, damping, iters, checkpoint_dir,
        )
    return _pagerank_shuffle(
        edges, meta, n, base, damping, iters, join_partitions(rows=n_edges),
        checkpoint_dir,
    )


def _contrib_blocks(refs, lut_nodes, lut_w, key_from="src", key_to="dst"):
    """One block group's weighted-message partial: Σ w(key_from) per
    key_to node. Runs as a raw task (state/blockfold); returns node-sized
    numpy (nodes, sums) combined across the group's blocks. Shared by the
    pagerank (src→dst) and HITS (both directions) broadcast loops."""
    import ray

    out_n, out_w = [], []
    for blk in ray.get(refs):
        if blk.num_rows == 0:
            continue
        idx = np.searchsorted(lut_nodes, blk[key_from].to_numpy(zero_copy_only=False))
        t = pa.table({"node": blk[key_to], "w": pa.array(lut_w[idx], pa.float64())})
        g = t.group_by("node").aggregate([("w", "sum")])
        out_n.append(g["node"].to_numpy(zero_copy_only=False))
        out_w.append(g["w_sum"].to_numpy(zero_copy_only=False))
    if not out_n:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    alln = np.concatenate(out_n)
    allw = np.concatenate(out_w)
    u, inv = np.unique(alln, return_inverse=True)
    s = np.zeros(len(u), np.float64)
    np.add.at(s, inv, allw)
    return u, s


def _pagerank_broadcast(
    edges: rd.Dataset,
    nodes: np.ndarray,
    out_cnt: np.ndarray,
    n: float,
    base: float,
    damping: float,
    iters: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    import ray

    dangling = out_cnt == 0
    r = np.full(len(nodes), 1.0 / n)

    from ..state import checkpoints as ckpts

    start, ckpt = ckpts.resume_round(checkpoint_dir, iters, "npy")
    if ckpt:
        r = np.load(ckpt)

    # the node array is static — ship it ONCE; only the per-src weight
    # array (8 B/node) rides a fresh blob per iteration. Rounds run as
    # raw-task folds over the materialized edge blocks (state/blockfold):
    # the previous per-round Dataset execution paid ~0.3-0.4 s of executor
    # fixed cost against ~50 ms of scan, ×iters.
    from ..state.blockfold import block_ref_groups, fold_blocks

    nodes_ref = ray.put(nodes)
    groups = block_ref_groups(edges)

    for round_idx in range(start, iters):
        dm = float(r[dangling].sum())
        # per-src contribution weight; dangling nodes never appear as src
        w_src = np.divide(r, out_cnt, out=np.zeros_like(r), where=out_cnt > 0)
        w_ref = ray.put(w_src)

        # per-group partials come back node-sized (≤ unique-dst rows per
        # group) and fold on the driver — no per-iteration shuffle op at
        # all; the big-graph path below keeps everything distributed.
        s = np.zeros(len(nodes))
        for part_n, part_w in fold_blocks(_contrib_blocks, groups, nodes_ref, w_ref):
            if len(part_n):
                np.add.at(s, np.searchsorted(nodes, part_n), part_w)
        # operation order mirrors SQL_PAGERANK: base/N + d*(s + dm/N)
        r = base / n + damping * (s + dm / n)
        if checkpoint_dir:
            ckpts.save_npy(checkpoint_dir, round_idx + 1, r)

    from ..state.grouped import dataset_from_table

    return dataset_from_table(
        pa.table({"node": pa.array(nodes), "rank_n": pa.array(round_sql(r * n, 4))})
    )


def _pagerank_shuffle(
    edges: rd.Dataset,
    meta: rd.Dataset,
    n: float,
    base: float,
    damping: float,
    iters: int,
    parts: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    def init_rank(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rank", pa.array(np.full(len(b), 1.0 / n, np.float64))
        )

    from ..state import checkpoints as ckpts

    start, ckpt = ckpts.resume_round(checkpoint_dir, iters, "parquet")
    if ckpt:
        ranks = pio.read_parquet(ckpt).materialize()
    else:
        ranks = meta.map_batches(init_rank, batch_format="pyarrow").materialize()

    # Ray's hash join/aggregate emit ZERO-COLUMN blocks for empty hash
    # partitions (see state/components._norm); every map below guards for
    # them and carries an explicit batch_size so the batcher coalesces the
    # schema-less empties instead of passing them through unmapped into
    # the next round's join.
    _EMPTY_MSG = pa.table(
        {"node": pa.array([], pa.int64()), "w": pa.array([], pa.float64()),
         "oc": pa.array([], pa.int64())}
    )

    def emit_contrib(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dst" not in b.column_names:
            return _EMPTY_MSG
        w = pc.divide(b["rank"], pc.cast(b["out_cnt"], pa.float64()))
        t = pa.table({"node": b["dst"], "w": w})
        # partial per-batch pre-agg: shuffle unique-dst rows, not edge rows
        t = t.group_by("node").aggregate([("w", "sum")])
        return pa.table(
            {
                "node": t["node"],
                "w": t["w_sum"],
                # placeholder 0 ≤ any true out_cnt: Max over the union picks
                # the real value from the zero-row below
                "oc": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    def emit_zeros(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _EMPTY_MSG
        return pa.table(
            {
                "node": b["node"],
                "w": pa.array(np.zeros(len(b), np.float64)),
                "oc": b["out_cnt"],
            }
        )

    def only_dangling(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["out_cnt"], 0))

    for round_idx in range(start, iters):
        dm = (
            ranks.map_batches(only_dangling, batch_format="pyarrow").sum("rank")
            or 0.0
        )
        joined = edges.join(
            ranks,
            join_type="inner",
            num_partitions=parts,
            on=("src",),
            right_on=("node",),
        )
        agg = (
            joined.map_batches(
                emit_contrib, batch_format="pyarrow", batch_size=262144
            )
            .union(ranks.map_batches(
                emit_zeros, batch_format="pyarrow", batch_size=262144
            ))
            .groupby("node", num_partitions=parts)
            .aggregate(Sum("w", alias_name="s"), Max("oc", alias_name="out_cnt"))
        )

        _EMPTY_RANKS = pa.table(
            {"node": pa.array([], pa.int64()), "out_cnt": pa.array([], pa.int64()),
             "rank": pa.array([], pa.float64())}
        )

        def rescale(b: pa.Table, _dm=dm) -> pa.Table:
            if b.num_rows == 0 or "node" not in b.column_names:
                return _EMPTY_RANKS
            # operation order mirrors SQL_PAGERANK exactly:
            # base/N + d*(s + dm/N) — scalar subterms fold once, like
            # DuckDB's constant scalar subqueries
            s = b["s"].to_numpy(zero_copy_only=False)
            r = base / n + damping * (s + _dm / n)
            return pa.table(
                {"node": b["node"], "out_cnt": b["out_cnt"], "rank": pa.array(r)}
            )

        ranks = agg.map_batches(
            rescale, batch_format="pyarrow", batch_size=262144
        ).materialize()
        if checkpoint_dir:
            # rank table written distributed (partitioned parquet); the
            # _complete marker lands AFTER the data (state/checkpoints.py)
            ckpts.save_parquet(checkpoint_dir, round_idx + 1, ranks)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"], "rank_n": pc.round(pc.multiply(b["rank"], n), ndigits=4, round_mode="half_towards_infinity")}
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# driver queries: PageRank + BFS levels over the order→part bipartite
# adjacency
# --------------------------------------------------------------------------

def _bipartite_edges(sf_dir: str) -> rd.Dataset:
    """DISTINCT (l_orderkey → l_partkey + PART_OFFSET) edges: a hubby
    bipartite graph (popular parts are high-in-degree sinks, every part is
    dangling). Shared by q_pagerank and q_bfs_levels."""
    from ..state.grouped import bucketed_map_groups

    def local_edges(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": b["l_orderkey"],
                "dst": pc.add(b["l_partkey"], pa.scalar(PART_OFFSET, pa.int64())),
            }
        )
        return t.group_by(["src", "dst"]).aggregate([])

    edges = pio.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    ).map_batches(local_edges, batch_format="pyarrow")
    return bucketed_map_groups(
        edges, ["src", "dst"], lambda df: df.drop_duplicates()
    )


def q_pagerank(sf_dir: str):
    """PageRank over the bipartite adjacency — exercises the dangling-mass
    path hard (every part node is dangling)."""
    return pagerank(_bipartite_edges(sf_dir))


def q_degree_distribution(sf_dir: str):
    """Out-degree histogram of the bipartite adjacency: drives the
    PRODUCTION ``node_meta`` pass (the metadata groupby behind PageRank's
    shuffle path, incl. the zero-degree dangling-node union trick) and
    makes it driver-visible — a wrong partial, lost dangling row, or
    mis-summed out_cnt breaks the value hash."""

    def hist_partial(b: pa.Table) -> pa.Table:
        t = b.group_by("out_cnt").aggregate([("node", "count")])
        return pa.table(
            {
                "out_degree": pc.cast(t["out_cnt"], pa.int64()),
                "p_n": pc.cast(t["node_count"], pa.int64()),
            }
        )

    edges = _bipartite_edges(sf_dir).materialize()
    return (
        node_meta(edges)
        .map_batches(hist_partial, batch_format="pyarrow", batch_size=262144)
        .groupby("out_degree")
        .aggregate(Sum("p_n", alias_name="n_nodes"))
    )


SQL_DEGREE_DISTRIBUTION = f"""
WITH edges AS (
  SELECT DISTINCT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem
),
deg AS (SELECT src AS node, COUNT(*) AS out_cnt FROM edges GROUP BY src),
nodes AS (
  SELECT node, MAX(oc) AS out_cnt FROM (
    SELECT node, out_cnt AS oc FROM deg
    UNION ALL SELECT DISTINCT dst AS node, 0 AS oc FROM edges
  ) GROUP BY node
)
SELECT CAST(out_cnt AS BIGINT) AS out_degree, COUNT(*) AS n_nodes
FROM nodes GROUP BY out_cnt
"""


# --------------------------------------------------------------------------
# BFS hop levels (unit-weight Bellman relaxation, bounded rounds)
# --------------------------------------------------------------------------

BFS_ROUNDS = 4
_BFS_UNREACHED = np.int64(1) << 62  # sentinel ≫ any real level, +1-safe


def bfs_levels(
    edges: rd.Dataset,
    source: int,
    rounds: int = BFS_ROUNDS,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Hop distance from ``source`` over the UNDIRECTED view of a DISTINCT
    (src:int64, dst:int64) edge set, bounded to ``rounds`` relaxation
    rounds (level ≤ rounds). Returns (node, level) for reached nodes only.

    Same two gated execution paths as :func:`pagerank` (pinned equal by
    test): under ``META_FOLD_EDGE_LIMIT`` the level array rides a
    ``ray.put`` blob and a round is ONE edge scan with per-batch grouped-Min
    partials folded on the driver; above it a fully shuffled loop runs
    (sym-edge hash join + union-groupby-Min per round, levels
    re-materialized as the iterative checkpoint).

    ``checkpoint_dir``: same round-granular persist/resume contract as
    :func:`pagerank` (state/checkpoints.py), plus a ``_converged`` marker
    when the frontier exhausts early."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "level": pa.array([], pa.int64())})
        )
    if n_edges <= META_FOLD_EDGE_LIMIT:
        nodes, _ = _node_meta_fold(edges)
        return _bfs_broadcast(edges, nodes, source, rounds, checkpoint_dir)
    return _bfs_shuffle(edges, source, rounds, checkpoint_dir)


def _bfs_relax_blocks(refs, lut_nodes, lut_d):
    """One block group's BFS relaxation partial: min(level)+1 per reached
    neighbor, both directions. Raw task (state/blockfold); returns
    (nodes, min_levels) numpy pair."""
    import ray

    out_n, out_d = [], []
    for blk in ray.get(refs):
        if blk.num_rows == 0:
            continue
        src = blk["src"].to_numpy(zero_copy_only=False)
        dst = blk["dst"].to_numpy(zero_copy_only=False)
        # undirected: relax both directions; only reached endpoints emit
        for a, bb in ((src, dst), (dst, src)):
            d = lut_d[np.searchsorted(lut_nodes, a)]
            m = d < _BFS_UNREACHED
            out_n.append(bb[m])
            out_d.append(d[m] + 1)
    alln = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
    if not len(alln):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    alld = np.concatenate(out_d)
    u, inv = np.unique(alln, return_inverse=True)
    dmin = np.full(len(u), _BFS_UNREACHED, np.int64)
    np.minimum.at(dmin, inv, alld)
    return u, dmin


def _bfs_broadcast(
    edges: rd.Dataset,
    nodes: np.ndarray,
    source: int,
    rounds: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    import ray

    from ..state import checkpoints as ckpts

    dist = np.full(len(nodes), _BFS_UNREACHED, np.int64)
    src_pos = np.searchsorted(nodes, np.int64(source))
    if src_pos < len(nodes) and nodes[src_pos] == source:
        dist[src_pos] = 0

    start, ckpt = ckpts.resume_round(checkpoint_dir, rounds, "npy")
    if ckpt:
        dist = np.load(ckpt)
        done = ckpts.converged_round(checkpoint_dir)
        if done is not None and done <= start:
            start = rounds  # frontier exhausted in a prior run

    # the node array is static — ship it ONCE; only the level array (8 B/
    # node) rides a fresh blob per round (same shape as _cc_broadcast).
    # Rounds are raw-task folds over the materialized edge blocks
    # (state/blockfold — kills the per-round Dataset-execution fixed cost)
    from ..state.blockfold import block_ref_groups, fold_blocks

    nodes_ref = ray.put(nodes)
    groups = block_ref_groups(edges)

    for round_idx in range(start, rounds):
        dist_ref = ray.put(dist)

        new = dist.copy()
        for part_n, part_d in fold_blocks(_bfs_relax_blocks, groups, nodes_ref, dist_ref):
            if len(part_n):
                np.minimum.at(new, np.searchsorted(nodes, part_n), part_d)
        if checkpoint_dir:
            ckpts.save_npy(checkpoint_dir, round_idx + 1, new)
        if np.array_equal(new, dist):
            ckpts.mark_converged(checkpoint_dir, round_idx + 1)
            break  # frontier exhausted — identical output either way
        dist = new

    m = dist < _BFS_UNREACHED
    from ..state.grouped import dataset_from_table

    return dataset_from_table(
        pa.table({"node": pa.array(nodes[m]), "level": pa.array(dist[m])})
    )


def _bfs_shuffle(
    edges: rd.Dataset,
    source: int,
    rounds: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Fully shuffled BFS: levels live as a distributed (node, level)
    Dataset (sentinel = unreached), one hash join + union-groupby-Min per
    round — nothing node-sized reaches the driver."""
    from ..state import checkpoints as ckpts

    parts = join_partitions(rows=edges.count())

    def sym(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"src": b["src"], "dst": b["dst"]}),
             pa.table({"src": b["dst"], "dst": b["src"]})]
        )

    sym_edges = edges.map_batches(
        sym, batch_format="pyarrow", batch_size=262144
    ).materialize()

    _EMPTY = pa.table(
        {"node": pa.array([], pa.int64()), "level": pa.array([], pa.int64())}
    )

    def init_levels(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _EMPTY
        lvl = np.full(b.num_rows, _BFS_UNREACHED, np.int64)
        lvl[b["node"].to_numpy(zero_copy_only=False) == source] = 0
        return pa.table({"node": b["node"], "level": pa.array(lvl)})

    start, ckpt = ckpts.resume_round(checkpoint_dir, rounds, "parquet")
    if ckpt:
        levels = pio.read_parquet(ckpt).materialize()
    else:
        levels = (
            node_meta(edges)
            .map_batches(init_levels, batch_format="pyarrow", batch_size=262144)
            .materialize()
        )

    def emit_relax(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dst" not in b.column_names:
            return _EMPTY
        lvl = b["level"].to_numpy(zero_copy_only=False)
        m = lvl < _BFS_UNREACHED
        t = pa.table(
            {"node": pc.array_filter(b["dst"], pa.array(m)),
             "level": pa.array(lvl[m] + 1)}
        )
        t = t.group_by("node").aggregate([("level", "min")])
        return pa.table({"node": t["node"], "level": t["level_min"]})

    from ray.data.aggregate import Min

    for round_idx in range(start, rounds):
        messages = sym_edges.join(
            levels, join_type="inner", num_partitions=parts,
            on=("src",), right_on=("node",),
        ).map_batches(emit_relax, batch_format="pyarrow", batch_size=262144)
        levels = (
            messages.union(levels)
            .groupby("node", num_partitions=parts)
            .aggregate(Min("level", alias_name="level"))
            .map_batches(
                lambda b: _EMPTY
                if b.num_rows == 0 or "node" not in b.column_names
                else b.select(["node", "level"]),
                batch_format="pyarrow", batch_size=262144,
            )
            .materialize()
        )
        if checkpoint_dir:
            ckpts.save_parquet(checkpoint_dir, round_idx + 1, levels)

    return levels.map_batches(
        lambda b: b.filter(pc.less(b["level"], pa.scalar(int(_BFS_UNREACHED)))),
        batch_format="pyarrow",
    )


def q_bfs_levels(sf_dir: str):
    """BFS levels from the smallest order key over the bipartite adjacency:
    level 1 = the source order's parts, level 2 = orders sharing them,
    level 3/4 = the next part/order ring — a supply-chain-style blast
    radius. Exactly restated by the unrolled-CTE ``SQL_BFS_LEVELS``."""
    edges = _bipartite_edges(sf_dir).materialize()
    # every src is an order key, so min(src) ≡ the SQL's MIN(l_orderkey);
    # None (empty edge set) → bfs_levels' empty guard returns the empty frame
    src = edges.min("src") if edges.count() else None
    return bfs_levels(edges, int(src) if src is not None else 0)


def _bfs_sql(rounds: int = BFS_ROUNDS) -> str:
    """Exact DuckDB restatement: same undirected relaxation, unrolled to
    ``rounds`` CTEs; NULL = unreached."""
    sql = f"""WITH edges AS (
  SELECT DISTINCT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem
),
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM sym),
s0 AS (SELECT MIN(l_orderkey) AS s FROM lineitem),
d0 AS (
  SELECT node, CASE WHEN node = (SELECT s FROM s0) THEN 0 END AS lvl FROM nodes
)"""
    for k in range(1, rounds + 1):
        sql += f""",
d{k} AS (
  SELECT d.node,
         CASE WHEN d.lvl IS NULL THEN m.in_lvl
              WHEN m.in_lvl IS NULL THEN d.lvl
              ELSE LEAST(d.lvl, m.in_lvl) END AS lvl
  FROM d{k-1} d LEFT JOIN (
    SELECT e.dst AS node, MIN(r.lvl) + 1 AS in_lvl
    FROM sym e JOIN d{k-1} r ON e.src = r.node
    WHERE r.lvl IS NOT NULL
    GROUP BY e.dst
  ) m ON d.node = m.node
)"""
    sql += (
        f"\nSELECT node, CAST(lvl AS BIGINT) AS level"
        f" FROM d{rounds} WHERE lvl IS NOT NULL"
    )
    return sql


SQL_BFS_LEVELS = _bfs_sql()


# --------------------------------------------------------------------------
# driver query: distributed connected components (state/components.py) on a
# deterministic star graph — exact SQL-restatable outcome
# --------------------------------------------------------------------------

def q_graph_components(sf_dir: str):
    """Per-user star graph over events (first event by (ts, event_id) hubs
    to every other event of that user; users with <2 events contribute no
    nodes), labelled by the PRODUCTION distributed min-label-propagation
    loop (state/components.py — salted dedup, bucketed Min exchange,
    fixpoint check). The star's diameter is 2, so the loop provably
    converges inside max_rounds; the expected outcome restates exactly as
    ``MIN(node) OVER (PARTITION BY user_id)`` (SQL_GRAPH_COMPONENTS), which
    makes the CC machinery driver-visible — any under-iteration, bad salt
    routing, or component mixing breaks the value hash."""
    import pandas as pd

    from ..state.components import connected_components, dedup_edges_salted
    from ..state.grouped import bucketed_map_groups

    def star_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        first = df.groupby("user_id", sort=False)["event_id"].transform("first")
        df = df[df["event_id"] != first]  # drops single-event users entirely
        hub = first[df.index]
        return pd.DataFrame(
            {"a": hub.astype(str), "b": df["event_id"].astype(str)}
        )

    ev = pio.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id"],
    )
    edges = bucketed_map_groups(ev, ["user_id"], star_edges)
    # diameter-2 star ⇒ min-label propagation provably converges in ≤2
    # rounds (hub absorbs the component min in round 1, spokes in round 2);
    # round 3 is margin. Fixed rounds skip the per-round fixpoint
    # join+count — the fixpoint path itself is pinned by
    # tests/test_kg_pipeline.py::test_distributed_components_match_unionfind.
    return connected_components(
        dedup_edges_salted(edges), max_rounds=3, check_fixpoint=False
    )


SQL_GRAPH_COMPONENTS = """
SELECT CAST(event_id AS VARCHAR) AS node,
       MIN(CAST(event_id AS VARCHAR)) OVER (PARTITION BY user_id) AS label
FROM events
QUALIFY COUNT(*) OVER (PARTITION BY user_id) >= 2
"""


def _pagerank_sql(iters: int = ITERS) -> str:
    """Exact DuckDB restatement: same init, same dangling redistribution,
    same operation order per iteration, unrolled to ``iters`` CTEs."""
    sql = f"""WITH edges AS (
  SELECT DISTINCT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem
),
deg AS (SELECT src AS node, COUNT(*) AS out_cnt FROM edges GROUP BY src),
nodes AS (
  SELECT node, MAX(oc) AS out_cnt FROM (
    SELECT node, out_cnt AS oc FROM deg
    UNION ALL SELECT DISTINCT dst AS node, 0 AS oc FROM edges
  ) GROUP BY node
),
nn AS (SELECT COUNT(*)::DOUBLE AS c FROM nodes),
r0 AS (SELECT node, out_cnt, 1.0/(SELECT c FROM nn) AS rank FROM nodes)"""
    for k in range(1, iters + 1):
        sql += f""",
d{k-1} AS (SELECT COALESCE(SUM(rank), 0.0) AS m FROM r{k-1} WHERE out_cnt = 0),
r{k} AS (
  SELECT nodes.node, nodes.out_cnt,
         0.15/(SELECT c FROM nn)
         + 0.85*(COALESCE(s.s, 0.0) + (SELECT m FROM d{k-1})/(SELECT c FROM nn)) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / r.out_cnt) AS s
    FROM edges e JOIN r{k-1} r ON e.src = r.node
    GROUP BY e.dst
  ) s ON nodes.node = s.node
)"""
    sql += f"\nSELECT node, round(rank * (SELECT c FROM nn), 4) AS rank_n FROM r{iters}"
    return sql


SQL_PAGERANK = _pagerank_sql()


# --------------------------------------------------------------------------
# triangle counting (rank-oriented two-join algorithm)
# --------------------------------------------------------------------------

def co_purchase_edges(sf_dir: str) -> rd.Dataset:
    """DISTINCT undirected co-purchase edges (a < b): parts appearing in
    the same order. The per-order fan-out is C(k, 2) with k = lines per
    order (≤ 7 in the TPC-H-shaped fixture) — at web scale a basket-size
    cap on k belongs here, BEFORE pair emission, since one k-item group
    costs k² pairs (the SQL restatement would add the same HAVING)."""
    from ..state.grouped import bucketed_map_groups

    def order_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # distinct (order, part) then the same repeat/cumsum block pair
        # emission as _wedge_arrays — no per-order python loop
        ok = df["l_orderkey"].to_numpy(np.int64)
        pk = df["l_partkey"].to_numpy(np.int64)
        if not len(ok):
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        ok, pk = ok[keep], pk[keep]
        _, a, b = _pairs_from_sorted(ok, pk)
        if not len(a):
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    pairs = bucketed_map_groups(
        pio.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        ),
        ["l_orderkey"],
        order_pairs,
    )
    return bucketed_map_groups(pairs, ["a", "b"], lambda df: df.drop_duplicates())


def _pairs_from_sorted(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(src, dst_i, dst_j) for every within-group pair of a (src, dst)
    stream already lexsorted by (src, dst) with distinct rows — pure
    repeat/cumsum block arithmetic, no per-group python loop (same shape
    as textops' ngram pair emission). dst_i < dst_j follows from the
    sort, so emitted pairs are in undirected-canonical order."""
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    g_sz = np.diff(np.r_[starts, len(src)])
    k = np.arange(len(src)) - np.repeat(starts, g_sz)
    cnt1 = np.repeat(g_sz, g_sz) - 1 - k
    n_pairs = int(cnt1.sum())
    if n_pairs == 0:
        e = np.empty(0, np.int64)
        return e, e, e
    i_idx = np.repeat(np.arange(len(src)), cnt1)
    blk = np.cumsum(cnt1) - cnt1
    j_idx = i_idx + 1 + (np.arange(n_pairs) - np.repeat(blk, cnt1))
    return src[i_idx], dst[i_idx], dst[j_idx]


def _wedge_arrays(
    df: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(src, a, b) for all out-neighbor pairs of every src group, wedge
    ends in undirected-canonical (a < b) order (= the edge set's key)."""
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    return _pairs_from_sorted(src[order], dst[order])


def _tri_degrees(edges: rd.Dataset, parts: int) -> rd.Dataset:
    """Materialized (node, deg) over a DISTINCT undirected (a < b) edge
    set: per-batch grouped partials → one shuffled Sum."""
    from ray.data.aggregate import Sum

    def deg_partials(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"node": pa.concat_arrays(
                [b["a"].combine_chunks(), b["b"].combine_chunks()]
            )}
        )
        g = t.group_by("node").aggregate([("node", "count")])
        return pa.table(
            {"node": g["node"], "d": pc.cast(g["node_count"], pa.int64())}
        )

    return (
        edges.map_batches(deg_partials, batch_format="pyarrow")
        .groupby("node", num_partitions=parts)
        .aggregate(Sum("d", alias_name="deg"))
        .materialize()
    )


def _attach_degrees(edges: rd.Dataset, deg: rd.Dataset, parts: int) -> rd.Dataset:
    """Attach (deg_a, deg_b) to a distinct (a, b) edge stream via two hash
    joins against the materialized degree table — the shared shuffle-path
    building block of the census orientation, k-core peel and
    assortativity."""

    def key_a(bt: pa.Table) -> pa.Table:
        if bt.num_columns == 0:
            return bt
        return pa.table({"a": bt["node"], "deg_a": bt["deg"]})

    def key_b(bt: pa.Table) -> pa.Table:
        if bt.num_columns == 0:
            return bt
        return pa.table({"b": bt["node"], "deg_b": bt["deg"]})

    return edges.join(
        deg.map_batches(key_a, batch_format="pyarrow"),
        join_type="inner", num_partitions=parts, on=("a",),
    ).join(
        deg.map_batches(key_b, batch_format="pyarrow"),
        join_type="inner", num_partitions=parts, on=("b",),
    )


def _tri_oriented(
    edges: rd.Dataset, deg: rd.Dataset, n_nodes: int, parts: int
) -> tuple[rd.Dataset, "tuple[np.ndarray, np.ndarray] | None"]:
    """Orient every edge from its lower-(deg, id) endpoint — ties broken
    by id give a strict total order, so each triangle has exactly one
    minimum vertex. Returns (oriented src→dst Dataset, sorted (nodes,
    deg) arrays when the node-sized degree table was broadcast, else
    None). Orientation bounds every out-degree at O(√m), making wedge
    volume O(m^1.5) worst-case regardless of hub skew."""

    def _orient_np(a, bb, da, db) -> pa.Table:
        a_lo = (da < db) | ((da == db) & (a < bb))
        return pa.table(
            {"src": np.where(a_lo, a, bb), "dst": np.where(a_lo, bb, a)}
        )

    if n_nodes <= BROADCAST_NODE_LIMIT:
        # degree table is node-sized: ship it ONCE (ray.put) and orient
        # inside map_batches via searchsorted — skips two hash-join
        # shuffles of the edge stream (same broadcast/shuffle split, and
        # threshold, as pagerank's rank state)
        import ray

        ddf = deg.to_pandas()
        order = np.argsort(ddf["node"].to_numpy(np.int64), kind="stable")
        arrs = (ddf["node"].to_numpy(np.int64)[order],
                ddf["deg"].to_numpy(np.int64)[order])
        deg_ref = ray.put(arrs)

        def orient_bc(b: pa.Table, ref=deg_ref) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            nodes_s, deg_s = ray.get(ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            da = deg_s[np.searchsorted(nodes_s, a)]
            db = deg_s[np.searchsorted(nodes_s, bb)]
            return _orient_np(a, bb, da, db)

        return edges.map_batches(orient_bc, batch_format="pyarrow"), arrs

    with_deg = _attach_degrees(edges, deg, parts)

    def orient(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return _orient_np(
            b["a"].to_numpy(zero_copy_only=False),
            b["b"].to_numpy(zero_copy_only=False),
            b["deg_a"].to_numpy(zero_copy_only=False),
            b["deg_b"].to_numpy(zero_copy_only=False),
        )

    return with_deg.map_batches(orient, batch_format="pyarrow"), None


# Sentinel: node ids too wide for 32-bit packing — caller falls back to
# the shuffled path. Distinct from None (empty edge set → empty result).
_IDS_TOO_WIDE = object()


def _driver_graph_state(edges: rd.Dataset, n_slices: int):
    """Driver-side degree/orient/pack for the ≤ EDGE_BROADCAST_LIMIT path.

    On this path the packed edge set ships to every closing task via
    ``ray.put``, i.e. the edge list is driver-resident anyway; folding
    the degree count (np.unique) and the
    (deg, id) orientation into the same pull removes the degree aggregate
    shuffle and the oriented map pass — measured 5.2 s + 0.3 s of the
    10.5 s sf0.1 census. Returns ``None`` when the edge set is empty, and
    ``_IDS_TOO_WIDE`` when any node id ≥ 2^31 (the 32-bit packing bound,
    checked HERE on the already-pulled arrays instead of a separate
    ``edges.max("b")`` Dataset aggregate — one fewer full execution).

    The oriented stream is lexsorted by (src, dst) and cut into
    ``n_slices`` wedge-volume-balanced, src-group-aligned row ranges so
    the closing fan-out needs no shuffle at all: every slice task reads
    the broadcast arrays zero-copy and probes its own wedges.
    """
    import ray

    edf = edges.to_pandas()
    a = edf["a"].to_numpy(np.int64)
    b = edf["b"].to_numpy(np.int64)
    if not len(a):
        return None
    if int(b.max()) >= (1 << 31):  # b > a on every row, so b bounds both
        return _IDS_TOO_WIDE
    nodes_s, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    deg_s = counts.astype(np.int64)
    da = deg_s[np.searchsorted(nodes_s, a)]
    db = deg_s[np.searchsorted(nodes_s, b)]
    a_lo = (da < db) | ((da == db) & (a < b))
    src = np.where(a_lo, a, b)
    dst = np.where(a_lo, b, a)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    packed = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    packed.sort()
    # slice boundaries balanced by per-group wedge volume C(out-deg, 2)
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    g_sz = np.diff(np.r_[starts, len(src)])
    cw = np.cumsum(g_sz * (g_sz - 1) // 2)
    n_slices = max(1, min(n_slices, len(starts)))
    targets = np.linspace(0, int(cw[-1]), n_slices + 1)[1:-1]
    grp_cut = np.unique(np.searchsorted(cw, targets) + 1)
    grp_cut = grp_cut[grp_cut < len(starts)]
    bounds = np.r_[0, starts[grp_cut], len(src)].astype(np.int64)
    return {
        "nodes": nodes_s,
        "deg": deg_s,
        "refs": (ray.put(src), ray.put(dst), ray.put(packed)),
        "bounds": bounds,
    }


_CLOSE_TASK_REMOTE = None


_CLOSE_CHUNK_WEDGES = 1 << 19  # ≈ 12 MB of wedge arrays per emit+probe round


def _close_slice_task(src, dst, packed, lo, hi, credit: bool, chunk_wedges: int):
    """One closing-probe slice: emit the slice's wedges, probe the packed
    edge array. Scalar triangle partial (``credit=False``) or per-node
    (nodes, t) credit partials (``credit=True``). ``chunk_wedges`` is
    passed from the driver (module globals don't reach workers).

    Wedges are emitted and probed in group-aligned CHUNKS of
    ~``_CLOSE_CHUNK_WEDGES`` instead of materializing the slice's whole
    wedge set: peak task memory stays ~12 MB however many wedges the
    slice carries (measured: the unchunked 40 MB-per-task allocation
    burst cost 7.7 s of concurrent cold-heap page faults on first use at
    24-way fan-out; chunked, the buffers stay allocator-resident). The
    residual bound is a single src group's C(out-deg, 2) — degree
    orientation caps out-deg at ~sqrt(2·m), so one group's wedges fit
    long before the slice's do."""
    s, d = src[lo:hi], dst[lo:hi]
    if not len(s):
        return (np.empty(0, np.int64), np.empty(0, np.int64)) if credit else 0
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    g_sz = np.diff(np.r_[starts, len(s)])
    cw = np.cumsum(g_sz * (g_sz - 1) // 2)
    total_w = int(cw[-1])
    if total_w == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64)) if credit else 0
    n_chunks = max(1, -(-total_w // chunk_wedges))
    # group-aligned cut points: chunk k covers groups [cuts[k], cuts[k+1])
    targets = np.arange(1, n_chunks) * (total_w / n_chunks)
    cuts = np.unique(np.r_[0, np.searchsorted(cw, targets) + 1, len(starts)])
    row_bounds = np.r_[starts[cuts[:-1]], len(s)]
    tri = 0
    us, cs = [], []
    for r0, r1 in zip(row_bounds[:-1], row_bounds[1:]):
        ws, wa, wb = _pairs_from_sorted(s[r0:r1], d[r0:r1])
        if not len(wa):
            continue
        m = _closing_mask(packed, wa, wb)
        if credit:
            cred = np.concatenate([ws[m], wa[m], wb[m]])
            u, c = np.unique(cred, return_counts=True)
            us.append(u)
            cs.append(c.astype(np.int64))
        else:
            tri += int(m.sum())
    if not credit:
        return tri
    if not us:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # combine the per-chunk partials (a src group never spans chunks, but
    # wedge ENDS recur across chunks — sum per node)
    allu = np.concatenate(us)
    allc = np.concatenate(cs)
    u, inv = np.unique(allu, return_inverse=True)
    c = np.zeros(len(u), np.int64)
    np.add.at(c, inv, allc)
    return u.astype(np.int64), c


def _close_slices(state, credit: bool) -> list:
    """Fan the closing probe out over the src-range slices of the
    broadcast oriented stream; returns the slice-result object refs
    (``ray.get`` them in any order — partials are commutative).

    RAW ray tasks, not a Dataset map: the probe is a pure scalar/array
    fold over driver-broadcast state, consumed on the driver either way,
    and the Dataset form (64 one-row blocks → map_batches → sum) measured
    2.7–3.6 s of per-execution fixed cost against 1.2–1.5 s for the same
    64 tasks raw at sf0.1 — the per-operator executor spin-up dwarfs the
    ~50 ms of per-slice compute. The driver path is already gated to
    driver-resident edge sets (≤ EDGE_BROADCAST_LIMIT), so no streaming
    backpressure is being bypassed."""
    import ray

    global _CLOSE_TASK_REMOTE
    if _CLOSE_TASK_REMOTE is None:  # one export per process
        _CLOSE_TASK_REMOTE = ray.remote(num_cpus=1)(_close_slice_task)
    remote = _CLOSE_TASK_REMOTE
    src_ref, dst_ref, packed_ref = state["refs"]
    bounds = state["bounds"]
    return [
        remote.remote(src_ref, dst_ref, packed_ref, int(lo), int(hi), credit,
                      _CLOSE_CHUNK_WEDGES)
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]


def _closing_mask(es: np.ndarray, wa: np.ndarray, wb: np.ndarray) -> np.ndarray:
    """Boolean mask over wedges whose (a, b) closing edge exists — a
    vectorized searchsorted probe against the sorted packed edge array."""
    keys = (wa.astype(np.uint64) << np.uint64(32)) | wb.astype(np.uint64)
    pos = np.searchsorted(es, keys)
    pos[pos >= len(es)] = len(es) - 1
    return es[pos] == keys


def triangle_count(edges: rd.Dataset) -> rd.Dataset:
    """Exact triangle census (n_nodes, n_edges, n_triangles) over a
    DISTINCT undirected (a < b) edge set — the degree-ORIENTED wedge
    algorithm (Suri & Vassilvitskii's MR pattern, public): orient, emit
    each source's C(out-degree, 2) out-neighbor pairs as wedges, count
    wedges whose closing edge exists.

    Closing check, gated like every small-side in this repo:
    - ≤ EDGE_BROADCAST_LIMIT and node ids < 2^31: the edge list is
      driver-resident anyway (the packed closing array ships via
      ray.put), so degrees/orientation fold into the same pull
      (:func:`_driver_graph_state`) and the closing probe fans out over
      wedge-balanced src slices of the broadcast arrays — no degree
      aggregate, no oriented map pass, no closing shuffle (measured
      19 s → 9.6 s → ~4 s at sf0.1).
    - larger: distributed degrees + orientation; wedges combine to
      (a, b, w) partial counts and meet edge-presence markers in ONE
      bucketed union-groupby on (a, b) — the shuffle moves partials, not
      raw wedges. (A Dataset.join here measured ~2× slower at toy scale
      from hash-join actor startup.)"""
    from ..state.grouped import bucketed_map_groups, dataset_from_table

    import ray

    edges = edges.materialize()
    n_edges = edges.count()
    parts = join_partitions(rows=n_edges)

    state = (
        _driver_graph_state(edges, n_slices=2 * parts)
        if n_edges <= EDGE_BROADCAST_LIMIT
        else _IDS_TOO_WIDE
    )
    if state is None:
        return dataset_from_table(
            pa.table({"n_nodes": pa.array([0], pa.int64()),
                      "n_edges": pa.array([0], pa.int64()),
                      "n_triangles": pa.array([0], pa.int64())})
        )
    if state is not _IDS_TOO_WIDE:
        n_nodes = len(state["nodes"])
        n_tri = sum(ray.get(_close_slices(state, credit=False)))
    else:
        deg = _tri_degrees(edges, parts)
        n_nodes = deg.count()
        oriented, _ = _tri_oriented(edges, deg, n_nodes, parts)

        def wedge_partials(df: pd.DataFrame) -> pd.DataFrame:
            """Per src-bucket: COMBINE wedges to (a, b, w) partial counts
            so the closing shuffle moves partials, not raw wedges."""
            _, wa, wb = _wedge_arrays(df)
            if not len(wa):
                return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                     "b": pd.Series(dtype="int64"),
                                     "w": pd.Series(dtype="int64"),
                                     "e": pd.Series(dtype="int64")})
            out = pd.DataFrame({"a": wa, "b": wb})
            out = out.groupby(["a", "b"], sort=False).size().reset_index(name="w")
            out["e"] = np.int64(0)
            return out

        def edge_marker(b: pa.Table) -> pa.Table:
            return pa.table(
                {"a": b["a"], "b": b["b"],
                 "w": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
                 "e": pa.nulls(b.num_rows, pa.int64()).fill_null(1)}
            )

        def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["a", "b"], sort=False).agg(
                w=("w", "sum"), e=("e", "max")
            )
            return pd.DataFrame({"t": [np.int64((g["w"] * g["e"]).sum())]})

        wedges = bucketed_map_groups(oriented, ["src"], wedge_partials)
        closed = bucketed_map_groups(
            wedges.union(edges.map_batches(edge_marker, batch_format="pyarrow")),
            ["a", "b"],
            close_wedges,
        )
        n_tri = int(closed.sum("t") or 0)
    return dataset_from_table(
        pa.table(
            {
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_triangles": pa.array([n_tri], pa.int64()),
            }
        )
    )


def q_triangle_count(sf_dir: str):
    """Triangle census of the co-purchase graph — exact, oracle-checked."""
    return triangle_count(co_purchase_edges(sf_dir))


SQL_TRIANGLE_COUNT = """
WITH pp AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
nodes AS (SELECT a AS v FROM pp UNION SELECT b FROM pp),
tri AS (
  SELECT count(*) AS c
  FROM pp e1
  JOIN pp e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN pp e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT (SELECT count(*) FROM nodes) AS n_nodes,
       (SELECT count(*) FROM pp) AS n_edges,
       (SELECT c FROM tri) AS n_triangles
"""


def clustering_coefficient(edges: rd.Dataset) -> rd.Dataset:
    """Per-node local clustering coefficient over a DISTINCT undirected
    (a < b) edge set: (node, deg, n_tri, coeff) for every node with
    deg ≥ 2, coeff = 2·n_tri / (deg·(deg−1)) — one integer product and
    one IEEE division, so the DuckDB oracle computes bit-identical
    doubles. Each triangle {s, a, b} credits all three vertices.

    Same oriented-wedge machinery as :func:`triangle_count`; the closing
    check keeps the wedge's source vertex so per-node credits can be
    emitted. Paths:
    - edge set ≤ EDGE_BROADCAST_LIMIT (node ids < 2^31): degrees and
      orientation fold into the driver pull the broadcast closing array
      needs anyway (:func:`_driver_graph_state`); wedge-balanced src
      slices of the broadcast oriented stream emit pre-aggregated
      (node, t) credit partials that fold onto the driver-resident degree
      arrays (np.add.at, node-sized) — no degree aggregate, no closing
      shuffle, no join.
    - larger: wedges (src, a, b) hash-join the edge set on (a, b), credit
      partials combine per batch, one groupby(node) Sum, then a left
      join back onto the degree table."""
    from ..state.grouped import bucketed_map_groups, dataset_from_table

    edges = edges.materialize()
    n_edges = edges.count()
    parts = join_partitions(rows=n_edges)

    def _coeff_table(nodes, degs, tris) -> pa.Table:
        m = degs >= 2
        nodes, degs, tris = nodes[m], degs[m], tris[m]
        denom = (degs * (degs - 1)).astype(np.float64)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array(degs, pa.int64()),
                "n_tri": pa.array(tris, pa.int64()),
                "coeff": pa.array((2.0 * tris) / denom, pa.float64()),
            }
        )

    import ray

    state = (
        _driver_graph_state(edges, n_slices=2 * parts)
        if n_edges <= EDGE_BROADCAST_LIMIT
        else _IDS_TOO_WIDE
    )
    if state is None:
        return dataset_from_table(
            pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64()),
                      "n_tri": pa.array([], pa.int64()),
                      "coeff": pa.array([], pa.float64())})
        )
    if state is not _IDS_TOO_WIDE:
        nodes_s, deg_s = state["nodes"], state["deg"]
        tris = np.zeros(len(nodes_s), np.int64)
        for u, c in ray.get(_close_slices(state, credit=True)):
            if len(u):
                np.add.at(tris, np.searchsorted(nodes_s, u), c)
        return dataset_from_table(_coeff_table(nodes_s, deg_s, tris))

    # shuffled path: raw wedges carry their source through the closing join
    deg = _tri_degrees(edges, parts)
    n_nodes = deg.count()
    oriented, _ = _tri_oriented(edges, deg, n_nodes, parts)

    def wedge_rows(df: pd.DataFrame) -> pd.DataFrame:
        ws, wa, wb = _wedge_arrays(df)
        return pd.DataFrame({"src_v": ws, "a": wa, "b": wb})

    wedges = bucketed_map_groups(oriented, ["src"], wedge_rows)
    closed = wedges.join(
        edges, join_type="inner", num_partitions=parts, on=("a", "b")
    )

    def credit_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src_v" not in b.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        cred = np.concatenate(
            [b[c].to_numpy(zero_copy_only=False) for c in ("src_v", "a", "b")]
        )
        u, c = np.unique(cred, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "t": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    tri_counts = (
        closed.map_batches(credit_partials, batch_format="pyarrow", batch_size=262144)
        .groupby("node", num_partitions=parts)
        .aggregate(Sum("t", alias_name="t"))
    )
    merged = deg.join(
        tri_counts, join_type="left_outer", num_partitions=parts, on=("node",)
    )

    def finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64()),
                             "coeff": pa.array([], pa.float64())})
        return _coeff_table(
            b["node"].to_numpy(zero_copy_only=False),
            b["deg"].to_numpy(zero_copy_only=False),
            np.nan_to_num(
                b["t"].to_numpy(zero_copy_only=False).astype(np.float64)
            ).astype(np.int64),
        )

    return merged.map_batches(finalize, batch_format="pyarrow", batch_size=262144)


def q_clustering_coefficient(sf_dir: str):
    """Local clustering coefficients of the co-purchase graph."""
    return clustering_coefficient(co_purchase_edges(sf_dir))


SQL_CLUSTERING_COEFFICIENT = """
WITH pp AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT v AS node, count(*) AS deg FROM (
    SELECT a AS v FROM pp UNION ALL SELECT b FROM pp
  ) GROUP BY v
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM pp e1
  JOIN pp e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN pp e3 ON e3.a = e1.b AND e3.b = e2.b
),
tcnt AS (
  SELECT v AS node, count(*) AS t FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY v
)
SELECT d.node, d.deg, coalesce(t.t, 0) AS n_tri,
       CAST(2 * coalesce(t.t, 0) AS DOUBLE) / (d.deg * (d.deg - 1)) AS coeff
FROM deg d LEFT JOIN tcnt t USING (node)
WHERE d.deg >= 2
"""


# --------------------------------------------------------------------------
# k-core decomposition (fixed-k iterative peeling, bounded rounds like BFS)
# --------------------------------------------------------------------------

KCORE_K = 65  # between min (≈40-49) and median (≈89-117) co-purchase
# degree, so peeling is non-vacuous yet the core survives at EVERY test SF
# (k=70+ collapses sf0.001's 200-node graph entirely, and an empty oracled
# result trips Ray's empty-Dataset.to_pandas() zero-column quirk in the
# driver's schema compare)
KCORE_ROUNDS = 8  # both paths AND the SQL oracle unroll exactly this bound


def _in_sorted(sorted_vals: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Membership of ``x`` in a non-empty SORTED array — searchsorted
    probe, no hash build (the np.isin path) per round."""
    pos = np.searchsorted(sorted_vals, x)
    pos[pos >= len(sorted_vals)] = len(sorted_vals) - 1
    return sorted_vals[pos] == x


def kcore(
    edges: rd.Dataset, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> rd.Dataset:
    """k-core of a DISTINCT undirected (a < b) edge set, bounded to
    ``rounds`` peeling rounds: each round deletes every node whose degree
    in the surviving subgraph is < k, cascading. Returns (node, core_deg)
    for the nodes surviving all rounds with their in-core degree —
    converged iff every core_deg ≥ k (KCORE_K converges in ≤ 6 rounds on
    the co-purchase fixture at every SF; the oracle unrolls the same
    bound).

    Paths (same gates as :func:`triangle_count`):
    - ≤ EDGE_BROADCAST_LIMIT: peeling is a sequential dependence chain of
      node-sized steps, so with the edge list driver-safe anyway the whole
      peel runs vectorized on the driver (np.unique degree census +
      sorted-membership mask per round; ~100 ms for 1.2M edges × 8
      rounds) — cheaper than 8 cluster barriers.
    - larger: per-round distributed peel — degree aggregate
      (:func:`_tri_degrees`) + two hash joins attach (deg_a, deg_b), a
      vectorized filter keeps edges with both endpoints ≥ k, and the
      survivors re-materialize as the round checkpoint; early exit when
      the edge count stops shrinking. Nothing node- or edge-sized reaches
      the driver."""
    from ..state.grouped import dataset_from_table

    _empty = pa.table({"node": pa.array([], pa.int64()),
                       "core_deg": pa.array([], pa.int64())})
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(_empty)
    parts = join_partitions(rows=n_edges)

    if n_edges <= EDGE_BROADCAST_LIMIT:
        edf = edges.to_pandas()
        a = edf["a"].to_numpy(np.int64)
        b = edf["b"].to_numpy(np.int64)
        for _ in range(rounds):
            nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
            bad = nodes[cnt < k]
            if not len(bad):
                break
            keep = ~(_in_sorted(bad, a) | _in_sorted(bad, b))
            a, b = a[keep], b[keep]
        if not len(a):
            return rd.from_arrow(_empty)
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        return dataset_from_table(
            pa.table({"node": pa.array(nodes, pa.int64()),
                      "core_deg": pa.array(cnt.astype(np.int64), pa.int64())})
        )

    def keep_ge_k(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0 or "a" not in bt.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        m = pc.and_(pc.greater_equal(bt["deg_a"], pa.scalar(k)),
                    pc.greater_equal(bt["deg_b"], pa.scalar(k)))
        return bt.filter(m).select(["a", "b"])

    cur, prev = edges, n_edges
    for _ in range(rounds):
        deg = _tri_degrees(cur, parts)
        cur = (
            _attach_degrees(cur, deg, parts)
            .map_batches(keep_ge_k, batch_format="pyarrow")
            .materialize()
        )
        n_now = cur.count()
        if n_now == prev:
            break
        prev = n_now
    if cur.count() == 0:
        return rd.from_arrow(_empty)
    return _tri_degrees(cur, parts).map_batches(
        lambda bt: pa.table({"node": bt["node"], "core_deg": bt["deg"]})
        if bt.num_rows else _empty,
        batch_format="pyarrow",
    )


def q_kcore(sf_dir: str):
    """(node, core_deg) of the KCORE_K-core of the co-purchase graph."""
    return kcore(co_purchase_edges(sf_dir))


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Exact DuckDB restatement: the same bounded peel, unrolled — round i
    keeps edges whose endpoints both have degree ≥ k in e_{i-1}. Every
    round CTE is MATERIALIZED: each e_i is referenced three times by
    round i+1, so default inlining re-plans the whole prefix 3^rounds
    times (observed as a too-many-open-files parquet re-scan storm)."""
    sql = """WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
)"""
    for i in range(1, rounds + 1):
        sql += f""",
d{i - 1} AS MATERIALIZED (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e{i - 1} UNION ALL SELECT b FROM e{i - 1}
  ) GROUP BY v
),
e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN d{i - 1} da ON da.v = e.a AND da.d >= {k}
  JOIN d{i - 1} db ON db.v = e.b AND db.d >= {k}
)"""
    sql += f""",
dfin AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
  ) GROUP BY v
)
SELECT v AS node, CAST(d AS BIGINT) AS core_deg FROM dfin"""
    return sql


SQL_KCORE = _kcore_sql()


# --------------------------------------------------------------------------
# degree assortativity (Newman's degree-degree Pearson r over edges)
# --------------------------------------------------------------------------


def _exact_i64_sum(arr: np.ndarray, chunk: int = 1 << 18) -> int:
    """Exact python-int total of an int64 array: int64 chunk sums folded
    into an unbounded python int. Exact while any chunk's true sum fits
    int64 — with ≤ 2^18-element chunks that holds for element magnitudes
    up to 2^45."""
    total = 0
    for lo in range(0, len(arr), chunk):
        total += int(arr[lo : lo + chunk].sum())
    return total


def _exact_prod_sum(x: np.ndarray, y: np.ndarray) -> int:
    """Exact Σ x·y for non-negative int64 arrays with elements < 2^31
    (degrees — a degree ≥ 2^31 would need two billion distinct
    neighbors; guarded below). The product is computed exactly in uint64
    (< 2^62) and split into 31-bit halves so every chunk sum stays far
    inside int64 at ANY scale — no wraparound on the > EDGE_BROADCAST_LIMIT
    path where a hub's deg² would overflow a plain int64 chunk sum."""
    if len(x) and (int(x.max()) >= (1 << 31) or int(y.max()) >= (1 << 31)):
        raise ValueError("assortativity: degree ≥ 2^31 unsupported")
    p = x.astype(np.uint64) * y.astype(np.uint64)
    hi = (p >> np.uint64(31)).astype(np.int64)  # < 2^31
    lo = (p & np.uint64((1 << 31) - 1)).astype(np.int64)  # < 2^31
    return (_exact_i64_sum(hi) << 31) + _exact_i64_sum(lo)


def assortativity(edges: rd.Dataset) -> rd.Dataset:
    """Degree assortativity of a DISTINCT undirected (a < b) edge set:
    Pearson correlation of endpoint degrees over the SYMMETRIZED edge
    list (each edge contributes both orderings — Newman 2002, public).
    Returns one row (n_edges, assortativity).

    Exactness: the five sufficient statistics (n, Σx, Σxy, Σx², Σy²) are
    integers (degrees are counts), accumulated exactly — python-int fold
    under the broadcast gate, int64 partial sums + groupby above it —
    and the final r is the SAME two-cast-one-divide double expression the
    DuckDB oracle computes from its HUGEINT sums, so the float matches
    bit-for-bit, not just to rounding."""
    import math

    from ..state.grouped import dataset_from_table

    def _result(n: int, sx: int, sxy: int, sxx: int, syy: int) -> rd.Dataset:
        num = float(n * sxy - sx * sx)
        den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sx * sx))
        r = num / den if den > 0 else 0.0
        return dataset_from_table(
            pa.table({"n_edges": pa.array([n // 2], pa.int64()),
                      "assortativity": pa.array([r], pa.float64())})
        )

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return dataset_from_table(
            pa.table({"n_edges": pa.array([0], pa.int64()),
                      "assortativity": pa.array([0.0], pa.float64())})
        )
    parts = join_partitions(rows=n_edges)

    if n_edges <= EDGE_BROADCAST_LIMIT:
        edf = edges.to_pandas()
        a = edf["a"].to_numpy(np.int64)
        b = edf["b"].to_numpy(np.int64)
        nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        deg = cnt.astype(np.int64)
        da = deg[np.searchsorted(nodes, a)]
        db = deg[np.searchsorted(nodes, b)]
        # symmetrized: x over (da, db), y over (db, da); Σx = Σy,
        # Σx² = Σy², and Σxy = 2·Σ(da·db)
        n = 2 * len(a)
        sx = _exact_i64_sum(da) + _exact_i64_sum(db)
        sxy = 2 * _exact_prod_sum(da, db)
        sxx = _exact_prod_sum(da, da) + _exact_prod_sum(db, db)
        return _result(n, sx, sxy, sxx, sxx)

    # distributed: degree join (same machinery as the census) → per-batch
    # int64 partial sums → one tiny groupby fold
    deg = _tri_degrees(edges, parts)

    joined = _attach_degrees(edges, deg, parts)

    def sums(bt: pa.Table) -> pa.Table:
        """One-row exact partial: the unbounded-magnitude sums (Σxy, Σx²
        can exceed int64 on this > EDGE_BROADCAST_LIMIT path) travel as
        decimal STRINGS and fold to python ints on the driver."""
        if bt.num_rows == 0 or "deg_a" not in bt.column_names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.string()),
                             "sxy": pa.array([], pa.string()),
                             "sxx": pa.array([], pa.string())})
        da = bt["deg_a"].to_numpy(zero_copy_only=False)
        db = bt["deg_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"n": pa.array([2 * len(da)], pa.int64()),
             "sx": pa.array(
                 [str(_exact_i64_sum(da) + _exact_i64_sum(db))], pa.string()
             ),
             "sxy": pa.array([str(2 * _exact_prod_sum(da, db))], pa.string()),
             "sxx": pa.array(
                 [str(_exact_prod_sum(da, da) + _exact_prod_sum(db, db))],
                 pa.string(),
             )}
        )

    part_sums = joined.map_batches(sums, batch_format="pyarrow").to_pandas()
    n = int(part_sums["n"].sum())
    sx = sum(int(v) for v in part_sums["sx"])
    sxy = sum(int(v) for v in part_sums["sxy"])
    sxx = sum(int(v) for v in part_sums["sxx"])
    return _result(n, sx, sxy, sxx, sxx)


def q_assortativity(sf_dir: str):
    """Degree assortativity of the co-purchase graph."""
    return assortativity(co_purchase_edges(sf_dir))


SQL_ASSORTATIVITY = """
WITH pp AS MATERIALIZED (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS d FROM (
    SELECT a AS v FROM pp UNION ALL SELECT b FROM pp
  ) GROUP BY v
),
sym AS (
  SELECT a AS x, b AS y FROM pp UNION ALL SELECT b, a FROM pp
),
j AS (
  SELECT da.d AS dx, db.d AS dy
  FROM sym JOIN deg da ON da.v = sym.x JOIN deg db ON db.v = sym.y
),
s AS (
  SELECT count(*)::HUGEINT AS n, sum(dx)::HUGEINT AS sx,
         sum(dx * dy)::HUGEINT AS sxy, sum(dx * dx)::HUGEINT AS sxx,
         sum(dy * dy)::HUGEINT AS syy
  FROM j
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                 * CAST(n * syy - sx * sx AS DOUBLE) > 0
            THEN CAST(n * sxy - sx * sx AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sx * sx AS DOUBLE))
            ELSE 0.0 END AS assortativity
FROM s
"""


# --------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg) over the directed bipartite graph
# --------------------------------------------------------------------------

HITS_ITERS = 5


def hits(edges: rd.Dataset, iters: int = HITS_ITERS) -> rd.Dataset:
    """HITS over a DISTINCT directed (src:int64, dst:int64) edge set:
    ``iters`` synchronous rounds of a ← Aᵀh, L2-normalize, h ← Aa,
    L2-normalize, from h ≡ 1. Returns (node, hub_n, auth_n) scaled by the
    node count N and rounded to 4 decimals on BOTH sides (iterative float
    drift between engine and SQL summation orders is ~1e-10; a 1e-4 grid
    makes a boundary flip ~100× rarer than the 6-dp gate grid — the
    session-9 sf0.1 fix) (same N-scaling sensitivity trick as rank_n:
    normalized scores shrink as 1/√N, so the raw values would vanish
    under the oracle gate's float rounding on big graphs).

    Three gated paths (pinned equal by test):
    - edges ≤ EDGE_BROADCAST_LIMIT: the edge list is driver-safe (the
      same gate the census/k-core driver paths use), so the whole
      iteration runs as numpy bincount passes over driver-resident id
      arrays — 10 cluster executions of ~0.7 s fixed cost each collapse
      to ~0.1 s of arithmetic (measured 7.6 → ~2.5 s at sf0.1, the
      residual being the bipartite edge build).
    - edges larger but nodes ≤ BROADCAST_NODE_LIMIT: score arrays ride
      ``ray.put`` blobs; each half-round is ONE edge scan with per-batch
      grouped partials folded on the driver, and the L2 norm is a driver
      scalar.
    - larger: fully shuffled — per half-round one hash join (scores onto
      the edge stream) + one groupby-Sum, the squared-norm as a
      distributed scalar aggregate, state re-materialized per round.
    """
    import ray

    _empty = pa.table({"node": pa.array([], pa.int64()),
                       "hub_n": pa.array([], pa.float64()),
                       "auth_n": pa.array([], pa.float64())})
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(_empty)

    if n_edges <= EDGE_BROADCAST_LIMIT:
        from ..state.grouped import dataset_from_table

        edf = edges.to_pandas()
        src = edf["src"].to_numpy(np.int64)
        dst = edf["dst"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        nn = len(nodes)
        h = np.ones(nn)
        a = np.zeros(nn)
        for _ in range(iters):
            a = np.bincount(di, weights=h[si], minlength=nn)
            za = float(np.sqrt((a * a).sum()))
            if za > 0:
                a /= za
            h = np.bincount(si, weights=a[di], minlength=nn)
            zh = float(np.sqrt((h * h).sum()))
            if zh > 0:
                h /= zh
        n = float(nn)
        return dataset_from_table(
            pa.table({"node": pa.array(nodes),
                      "hub_n": pa.array(round_sql(h * n, 4)),
                      "auth_n": pa.array(round_sql(a * n, 4))})
        )

    if n_edges <= META_FOLD_EDGE_LIMIT:
        nodes, _ = _node_meta_fold(edges)
    else:
        meta = node_meta(edges).materialize()
        if meta.count() > BROADCAST_NODE_LIMIT:
            return _hits_shuffle(edges, meta, iters)
        mdf = meta.to_pandas()
        nodes = np.sort(mdf["node"].to_numpy(np.int64))

    from ..state.blockfold import block_ref_groups, fold_blocks
    from ..state.grouped import dataset_from_table

    nodes_ref = ray.put(nodes)
    groups = block_ref_groups(edges)

    def fold_pass(w: np.ndarray, key_from: str, key_to: str) -> np.ndarray:
        """One edge scan: Σ w[from] grouped by to, folded driver-side —
        raw-task block fold (state/blockfold), same task as pagerank."""
        w_ref = ray.put(w)
        s = np.zeros(len(nodes))
        for part_n, part_w in fold_blocks(
            _contrib_blocks, groups, nodes_ref, w_ref, key_from, key_to
        ):
            if len(part_n):
                np.add.at(s, np.searchsorted(nodes, part_n), part_w)
        return s

    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(iters):
        a = fold_pass(h, "src", "dst")
        za = float(np.sqrt((a * a).sum()))
        a = a / za if za > 0 else a
        h = fold_pass(a, "dst", "src")
        zh = float(np.sqrt((h * h).sum()))
        h = h / zh if zh > 0 else h

    n = float(len(nodes))
    return dataset_from_table(
        pa.table({"node": pa.array(nodes),
                  "hub_n": pa.array(round_sql(h * n, 4)),
                  "auth_n": pa.array(round_sql(a * n, 4))})
    )


def _hits_shuffle(edges: rd.Dataset, meta: rd.Dataset, iters: int) -> rd.Dataset:
    """Fully shuffled HITS for > BROADCAST_NODE_LIMIT node tables: state is
    a distributed (node, h, a) Dataset; each half-round is one hash join +
    one groupby-Sum, the L2 norm a distributed scalar aggregate."""
    from ray.data.aggregate import Sum

    parts = join_partitions(rows=edges.count())
    n = float(meta.count())

    state = meta.map_batches(
        lambda b: pa.table(
            {"node": b["node"],
             "h": pa.array(np.ones(b.num_rows)),
             "a": pa.array(np.zeros(b.num_rows))}
        ) if b.num_rows else pa.table(
            {"node": pa.array([], pa.int64()),
             "h": pa.array([], pa.float64()),
             "a": pa.array([], pa.float64())}
        ),
        batch_format="pyarrow", batch_size=262144,
    ).materialize()

    def half_round(score_col: str, key_from: str, key_to: str,
                   out_col: str, st: rd.Dataset) -> rd.Dataset:
        msgs = (
            edges.join(
                st.map_batches(
                    lambda b, _c=score_col: pa.table(
                        {key_from: b["node"], "w": b[_c]}
                    ) if b.num_rows else pa.table(
                        {key_from: pa.array([], pa.int64()),
                         "w": pa.array([], pa.float64())}
                    ),
                    batch_format="pyarrow", batch_size=262144,
                ),
                join_type="inner", num_partitions=parts, on=(key_from,),
            )
            .map_batches(
                lambda b: pa.table({"node": b[key_to], "w": b["w"]})
                if b.num_rows and key_to in b.column_names
                else pa.table({"node": pa.array([], pa.int64()),
                               "w": pa.array([], pa.float64())}),
                batch_format="pyarrow", batch_size=262144,
            )
            .groupby("node", num_partitions=parts)
            .aggregate(Sum("w", alias_name="w"))
            .materialize()
        )
        z = float(
            msgs.map_batches(
                lambda b: pa.table({"q": pc.multiply(b["w"], b["w"])})
                if b.num_rows else pa.table({"q": pa.array([], pa.float64())}),
                batch_format="pyarrow", batch_size=262144,
            ).sum("q")
            or 0.0
        ) ** 0.5
        merged = st.join(
            msgs, join_type="left_outer", num_partitions=parts, on=("node",)
        )

        def apply(b: pa.Table, _z=z, _o=out_col) -> pa.Table:
            if b.num_rows == 0 or "node" not in b.column_names:
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "h": pa.array([], pa.float64()),
                     "a": pa.array([], pa.float64())}
                )
            w = np.nan_to_num(b["w"].to_numpy(zero_copy_only=False).astype(np.float64))
            vals = w / _z if _z > 0 else w
            cols = {"node": b["node"], "h": b["h"], "a": b["a"]}
            cols[_o] = pa.array(vals)
            return pa.table(cols)

        return merged.map_batches(
            apply, batch_format="pyarrow", batch_size=262144
        ).materialize()

    for _ in range(iters):
        state = half_round("h", "src", "dst", "a", state)
        state = half_round("a", "dst", "src", "h", state)

    return state.map_batches(
        lambda b: pa.table(
            {"node": b["node"],
             "hub_n": pc.round(pc.multiply(b["h"], pa.scalar(n)), ndigits=4, round_mode="half_towards_infinity"),
             "auth_n": pc.round(pc.multiply(b["a"], pa.scalar(n)), ndigits=4, round_mode="half_towards_infinity")}
        ) if b.num_rows and "node" in b.column_names
        else pa.table({"node": pa.array([], pa.int64()),
                       "hub_n": pa.array([], pa.float64()),
                       "auth_n": pa.array([], pa.float64())}),
        batch_format="pyarrow", batch_size=262144,
    )


def q_hits(sf_dir: str):
    """(node, hub_n, auth_n) over the order→part bipartite graph: orders
    are the hubs, parts the authorities (each side's opposite score decays
    to 0 after round one — bipartite HITS is the co-purchase popularity
    eigenvector pair)."""
    return hits(_bipartite_edges(sf_dir))


def _hits_sql(iters: int = HITS_ITERS) -> str:
    """Exact DuckDB restatement: unrolled a/h rounds with MATERIALIZED
    CTEs (each state is referenced twice per round — default inlining
    would re-plan the prefix 2^rounds times)."""
    sql = f"""WITH edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst FROM lineitem
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM nodes),
h0 AS MATERIALIZED (SELECT node, 1.0 AS s FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
ar{i} AS MATERIALIZED (
  SELECT n.node, coalesce(m.s, 0) AS s
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(h.s) AS s
    FROM edges e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst
  ) m ON n.node = m.node
),
a{i} AS MATERIALIZED (
  SELECT node, CASE WHEN z.z > 0 THEN s / z.z ELSE s END AS s
  FROM ar{i}, (SELECT sqrt(SUM(s * s)) AS z FROM ar{i}) z
),
hr{i} AS MATERIALIZED (
  SELECT n.node, coalesce(m.s, 0) AS s
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, SUM(a.s) AS s
    FROM edges e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
  ) m ON n.node = m.node
),
h{i} AS MATERIALIZED (
  SELECT node, CASE WHEN z.z > 0 THEN s / z.z ELSE s END AS s
  FROM hr{i}, (SELECT sqrt(SUM(s * s)) AS z FROM hr{i}) z
)"""
    sql += f"""
SELECT h.node, round(h.s * (SELECT c FROM nn), 4) AS hub_n,
       round(a.s * (SELECT c FROM nn), 4) AS auth_n
FROM h{iters} h JOIN a{iters} a USING (node)"""
    return sql


SQL_HITS = _hits_sql()


# --------------------------------------------------------------------------
# co-purchase association lift (market-basket mining over the same
# order→part projection that feeds the triangle family)
# --------------------------------------------------------------------------

LIFT_MIN_PAIR = 3
LIFT_MIN = 2.0


def q_copurchase_lift(sf_dir: str):
    """(a, b, n_ab, lift) for part pairs co-purchased in ≥ LIFT_MIN_PAIR
    orders with lift ≥ LIFT_MIN, where lift = n_ab·N / (n_a·n_b) over
    distinct (order, part) incidences — the classic association-rule lift,
    scored float-exactly (two exact integer products, one IEEE division)
    so the oracle's threshold cut can never flip on rounding.

    Shape: bucketed distinct (order, part) → per-order pair emission
    (block arithmetic) re-bucketed on (a, b) so each bucket's group size
    IS the global pair count → per-part counts are node-sized and ride a
    ``ray.put`` blob into the final scoring map (searchsorted), or two
    hash joins above BROADCAST_NODE_LIMIT."""
    from ..state.grouped import bucketed_map_groups

    op = bucketed_map_groups(
        pio.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        ).map_batches(
            lambda b: b.select(["l_orderkey", "l_partkey"])
            .group_by(["l_orderkey", "l_partkey"])
            .aggregate([]),
            batch_format="pyarrow",
        ),
        ["l_orderkey", "l_partkey"],
        lambda df: df.drop_duplicates(),
    ).materialize()

    # N = distinct orders: per-batch unique combiner, driver distinct
    n_orders = len(
        op.map_batches(
            lambda b: pa.table({"o": pc.unique(b["l_orderkey"])}),
            batch_format="pyarrow",
        ).unique("o")
    )

    # per-part incidence counts (node-sized)
    cnt = (
        op.map_batches(
            lambda b: (lambda g: pa.table(
                {"p": g["l_partkey"],
                 "c": pc.cast(g["l_partkey_count"], pa.int64())}
            ))(b.group_by("l_partkey").aggregate([("l_partkey", "count")])),
            batch_format="pyarrow",
        )
        .groupby("p", num_partitions=join_partitions(rows=op.count()))
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )

    def order_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.rename(columns={"l_orderkey": "src", "l_partkey": "dst"})
        _, wa, wb = _wedge_arrays(g)
        return pd.DataFrame({"a": wa, "b": wb})

    pairs = bucketed_map_groups(op, ["l_orderkey"], order_pairs)

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], sort=False).size().reset_index(name="n_ab")
        return out[out["n_ab"] >= LIFT_MIN_PAIR]

    counted = bucketed_map_groups(pairs, ["a", "b"], pair_counts)

    n_parts = cnt.count()
    if n_parts <= BROADCAST_NODE_LIMIT:
        import ray

        cdf = cnt.to_pandas()
        order = np.argsort(cdf["p"].to_numpy(np.int64), kind="stable")
        cnt_ref = ray.put(
            (cdf["p"].to_numpy(np.int64)[order],
             cdf["c"].to_numpy(np.int64)[order])
        )

        def score(b: pa.Table, _ref=cnt_ref) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                     "n_ab": pa.array([], pa.int64()),
                     "lift": pa.array([], pa.float64())}
                )
            import ray as _ray

            ps, cs = _ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            n_ab = b["n_ab"].to_numpy(zero_copy_only=False)
            lift = (n_ab * np.int64(n_orders)).astype(np.float64) / (
                cs[np.searchsorted(ps, a)] * cs[np.searchsorted(ps, bb)]
            )
            m = lift >= LIFT_MIN
            return pa.table(
                {"a": pa.array(a[m]), "b": pa.array(bb[m]),
                 "n_ab": pa.array(n_ab[m]), "lift": pa.array(lift[m])}
            )

        return counted.map_batches(score, batch_format="pyarrow")

    parts_j = join_partitions(rows=op.count())
    joined = counted.join(
        cnt.map_batches(
            lambda b: pa.table({"a": b["p"], "ca": b["c"]}) if b.num_columns else b,
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=parts_j, on=("a",),
    ).join(
        cnt.map_batches(
            lambda b: pa.table({"b": b["p"], "cb": b["c"]}) if b.num_columns else b,
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=parts_j, on=("b",),
    )

    def score_joined(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_ab" not in b.column_names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "n_ab": pa.array([], pa.int64()),
                 "lift": pa.array([], pa.float64())}
            )
        n_ab = b["n_ab"].to_numpy(zero_copy_only=False)
        lift = (n_ab * np.int64(n_orders)).astype(np.float64) / (
            b["ca"].to_numpy(zero_copy_only=False)
            * b["cb"].to_numpy(zero_copy_only=False)
        )
        m = lift >= LIFT_MIN
        return pa.table(
            {"a": pa.array(b["a"].to_numpy(zero_copy_only=False)[m]),
             "b": pa.array(b["b"].to_numpy(zero_copy_only=False)[m]),
             "n_ab": pa.array(n_ab[m]), "lift": pa.array(lift[m])}
        )

    return joined.map_batches(score_joined, batch_format="pyarrow")


SQL_COPURCHASE_LIFT = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT count(DISTINCT o) AS n FROM op),
cnt AS (SELECT p, count(*) AS c FROM op GROUP BY p),
pairs AS (
  SELECT x.p AS a, y.p AS b, count(*) AS n_ab
  FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
  GROUP BY 1, 2
)
SELECT pairs.a, pairs.b, pairs.n_ab,
       CAST(pairs.n_ab * n.n AS DOUBLE) / (ca.c * cb.c) AS lift
FROM pairs
JOIN cnt ca ON ca.p = pairs.a
JOIN cnt cb ON cb.p = pairs.b
CROSS JOIN n
WHERE pairs.n_ab >= {LIFT_MIN_PAIR}
  AND CAST(pairs.n_ab * n.n AS DOUBLE) / (ca.c * cb.c) >= {LIFT_MIN}
"""


# --------------------------------------------------------------------------
# weighted single-source shortest paths (bounded Bellman-Ford) — the
# weighted sibling of bfs_levels, same gated broadcast/shuffle dichotomy,
# same checkpoint contract, exact integer min-plus arithmetic
# --------------------------------------------------------------------------

SSSP_ROUNDS = 4
_SSSP_INF = np.int64(1) << 62  # sentinel ≫ any real distance, +w-safe


def _weighted_bipartite_edges(sf_dir: str) -> rd.Dataset:
    """(l_orderkey → l_partkey + PART_OFFSET, w = min quantity) weighted
    edges: per-batch (src, dst) group-Min partials shrink the stream, one
    bucketed shuffle takes the exact global min per edge (multi-edges —
    the same part on several lines of one order — collapse to their
    cheapest weight, the rule the oracle states as MIN(w))."""
    from ..state.grouped import bucketed_map_groups

    def local_edges(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": b["l_orderkey"],
                "dst": pc.add(b["l_partkey"], pa.scalar(PART_OFFSET, pa.int64())),
                "w": pc.cast(b["l_quantity"], pa.int64()),
            }
        )
        t = t.group_by(["src", "dst"]).aggregate([("w", "min")])
        return t.rename_columns(["src", "dst", "w"])

    edges = pio.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(local_edges, batch_format="pyarrow")
    return bucketed_map_groups(
        edges,
        ["src", "dst"],
        lambda df: df.groupby(["src", "dst"], as_index=False)["w"].min(),
    )


def sssp_distances(
    edges: rd.Dataset,
    source: int,
    rounds: int = SSSP_ROUNDS,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Min-plus distance from ``source`` over the UNDIRECTED view of a
    weighted (src:int64, dst:int64, w:int64 ≥ 0) edge set, bounded to
    ``rounds`` Bellman-Ford relaxation rounds (i.e. cheapest path using
    ≤ rounds hops — exactly what the unrolled-CTE oracle computes; run
    rounds = |V|−1 for the unbounded classic). Returns (node, dist) for
    reached nodes only. Integer weights keep every comparison exact at
    any parallelism.

    Same gated dichotomy as :func:`bfs_levels` / :func:`pagerank`, pinned
    equal by test: under ``META_FOLD_EDGE_LIMIT`` distances ride a
    ``ray.put`` int64 array and a round is one raw-task fold over the
    materialized edge blocks; above it a fully shuffled join +
    union-groupby-Min loop runs with the distance Dataset re-materialized
    as the iterative checkpoint."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
        )
    if n_edges <= META_FOLD_EDGE_LIMIT:
        nodes, _ = _node_meta_fold(edges)
        return _sssp_broadcast(edges, nodes, source, rounds, checkpoint_dir)
    return _sssp_shuffle(edges, source, rounds, checkpoint_dir)


def _sssp_relax_blocks(refs, lut_nodes, lut_d):
    """One block group's relaxation partial: min(dist + w) per reached
    neighbor, both directions (raw task, state/blockfold)."""
    import ray

    out_n, out_d = [], []
    for blk in ray.get(refs):
        if blk.num_rows == 0:
            continue
        src = blk["src"].to_numpy(zero_copy_only=False)
        dst = blk["dst"].to_numpy(zero_copy_only=False)
        w = blk["w"].to_numpy(zero_copy_only=False)
        for a, bb in ((src, dst), (dst, src)):
            d = lut_d[np.searchsorted(lut_nodes, a)]
            m = d < _SSSP_INF
            out_n.append(bb[m])
            out_d.append(d[m] + w[m])
    alln = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
    if not len(alln):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    alld = np.concatenate(out_d)
    u, inv = np.unique(alln, return_inverse=True)
    dmin = np.full(len(u), _SSSP_INF, np.int64)
    np.minimum.at(dmin, inv, alld)
    return u, dmin


def _sssp_broadcast(
    edges: rd.Dataset,
    nodes: np.ndarray,
    source: int,
    rounds: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    import ray

    from ..state import checkpoints as ckpts
    from ..state.blockfold import block_ref_groups, fold_blocks

    dist = np.full(len(nodes), _SSSP_INF, np.int64)
    src_pos = np.searchsorted(nodes, np.int64(source))
    if src_pos < len(nodes) and nodes[src_pos] == source:
        dist[src_pos] = 0

    start, ckpt = ckpts.resume_round(checkpoint_dir, rounds, "npy")
    if ckpt:
        dist = np.load(ckpt)
        done = ckpts.converged_round(checkpoint_dir)
        if done is not None and done <= start:
            start = rounds

    nodes_ref = ray.put(nodes)
    groups = block_ref_groups(edges)

    for round_idx in range(start, rounds):
        dist_ref = ray.put(dist)
        new = dist.copy()
        for part_n, part_d in fold_blocks(
            _sssp_relax_blocks, groups, nodes_ref, dist_ref
        ):
            if len(part_n):
                np.minimum.at(new, np.searchsorted(nodes, part_n), part_d)
        if checkpoint_dir:
            ckpts.save_npy(checkpoint_dir, round_idx + 1, new)
        if np.array_equal(new, dist):
            ckpts.mark_converged(checkpoint_dir, round_idx + 1)
            break
        dist = new

    m = dist < _SSSP_INF
    from ..state.grouped import dataset_from_table

    return dataset_from_table(
        pa.table({"node": pa.array(nodes[m]), "dist": pa.array(dist[m])})
    )


def _sssp_shuffle(
    edges: rd.Dataset,
    source: int,
    rounds: int,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """Fully shuffled Bellman-Ford: distances live as a distributed
    (node, dist) Dataset, one hash join + union-groupby-Min per round."""
    from ..state import checkpoints as ckpts

    parts = join_partitions(rows=edges.count())

    def sym(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"src": b["src"], "dst": b["dst"], "w": b["w"]}),
             pa.table({"src": b["dst"], "dst": b["src"], "w": b["w"]})]
        )

    sym_edges = edges.map_batches(
        sym, batch_format="pyarrow", batch_size=262144
    ).materialize()

    _EMPTY = pa.table(
        {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
    )

    def init_dist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _EMPTY
        d = np.full(b.num_rows, _SSSP_INF, np.int64)
        d[b["node"].to_numpy(zero_copy_only=False) == source] = 0
        return pa.table({"node": b["node"], "dist": pa.array(d)})

    start, ckpt = ckpts.resume_round(checkpoint_dir, rounds, "parquet")
    if ckpt:
        dists = pio.read_parquet(ckpt).materialize()
    else:
        dists = (
            node_meta(edges)
            .map_batches(init_dist, batch_format="pyarrow", batch_size=262144)
            .materialize()
        )

    def emit_relax(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dst" not in b.column_names:
            return _EMPTY
        d = b["dist"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        m = d < _SSSP_INF
        t = pa.table(
            {"node": pc.array_filter(b["dst"], pa.array(m)),
             "dist": pa.array(d[m] + w[m])}
        )
        t = t.group_by("node").aggregate([("dist", "min")])
        return pa.table({"node": t["node"], "dist": t["dist_min"]})

    from ray.data.aggregate import Min

    for round_idx in range(start, rounds):
        messages = sym_edges.join(
            dists, join_type="inner", num_partitions=parts,
            on=("src",), right_on=("node",),
        ).map_batches(emit_relax, batch_format="pyarrow", batch_size=262144)
        dists = (
            messages.union(dists)
            .groupby("node", num_partitions=parts)
            .aggregate(Min("dist", alias_name="dist"))
            .map_batches(
                lambda b: _EMPTY
                if b.num_rows == 0 or "node" not in b.column_names
                else b.select(["node", "dist"]),
                batch_format="pyarrow", batch_size=262144,
            )
            .materialize()
        )
        if checkpoint_dir:
            ckpts.save_parquet(checkpoint_dir, round_idx + 1, dists)

    return dists.map_batches(
        lambda b: b.filter(pc.less(b["dist"], pa.scalar(int(_SSSP_INF)))),
        batch_format="pyarrow",
    )


def q_sssp(sf_dir: str):
    """Cheapest-quantity paths from the smallest order key over the
    weighted bipartite adjacency, ≤ SSSP_ROUNDS hops — a weighted
    supply-chain blast radius. Exactly restated by ``SQL_SSSP``."""
    edges = _weighted_bipartite_edges(sf_dir).materialize()
    src = edges.min("src") if edges.count() else None
    return sssp_distances(edges, int(src) if src is not None else 0)


def _sssp_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Exact DuckDB restatement: min-plus relaxation unrolled to
    ``rounds`` CTEs; NULL = unreached."""
    sql = f"""WITH edges AS (
  SELECT l_orderkey AS src, l_partkey + {PART_OFFSET} AS dst,
         MIN(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
),
sym AS (SELECT src, dst, w FROM edges UNION ALL SELECT dst, src, w FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM sym),
s0 AS (SELECT MIN(l_orderkey) AS s FROM lineitem),
d0 AS (
  SELECT node, CASE WHEN node = (SELECT s FROM s0) THEN 0 END AS dist FROM nodes
)"""
    for k in range(1, rounds + 1):
        sql += f""",
d{k} AS (
  SELECT d.node,
         CASE WHEN d.dist IS NULL THEN m.in_d
              WHEN m.in_d IS NULL THEN d.dist
              ELSE LEAST(d.dist, m.in_d) END AS dist
  FROM d{k-1} d LEFT JOIN (
    SELECT e.dst AS node, MIN(r.dist + e.w) AS in_d
    FROM sym e JOIN d{k-1} r ON e.src = r.node
    WHERE r.dist IS NOT NULL
    GROUP BY e.dst
  ) m ON d.node = m.node
)"""
    sql += (
        f"\nSELECT node, CAST(dist AS BIGINT) AS dist"
        f" FROM d{rounds} WHERE dist IS NOT NULL"
    )
    return sql


SQL_SSSP = _sssp_sql()
