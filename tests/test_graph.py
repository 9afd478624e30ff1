"""PageRank (pipelines/graph.py): semantics vs a sequential numpy
restatement, dangling-mass conservation, and the node_meta union+Max trick.

The exact DuckDB parity (unrolled-CTE SQL) is enforced by the oracle gate
(tools/check_oracle.py pagerank); these tests pin the distributed
implementation against an INDEPENDENT dense restatement on graphs small
enough to enumerate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from sifr_project_java_ontology_processing_ray.pipelines import graph


def _seq_pagerank(edges: list[tuple[int, int]], iters: int = 5, d: float = 0.85):
    """Dense sequential restatement of the documented semantics."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in set(edges):
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[out == 0].sum()
        s = np.zeros(n)
        for u, v in set(edges):
            s[idx[v]] += r[idx[u]] / out[idx[u]]
        r = 0.15 / n + d * (s + dm / n)
    return {v: r[idx[v]] * n for v in nodes}


def _edges_ds(edges: list[tuple[int, int]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], pa.int64()),
                "dst": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )


def _run(edges: list[tuple[int, int]]) -> dict[int, float]:
    df = graph.pagerank(_edges_ds(sorted(set(edges)))).to_pandas()
    return dict(zip(df["node"], df["rank_n"]))


def test_pagerank_matches_sequential(ray_session):
    # cycle + chord + two-node sink chain + isolated-source fan
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 5), (6, 1), (6, 5)]
    got = _run(edges)
    want = _seq_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_pagerank_dangling_mass_conserved(ray_session):
    # star into a single sink: every rank unit flows through the dangling
    # redistribution each round; total mass must stay exactly 1 (= N after
    # the ×N scaling)
    edges = [(i, 99) for i in range(1, 9)]
    got = _run(edges)
    assert sum(got.values()) == pytest.approx(len(got), rel=1e-12)
    want = _seq_pagerank(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # the sink outranks every source
    assert got[99] > max(got[i] for i in range(1, 9))


def test_shuffle_and_broadcast_paths_agree(ray_session, monkeypatch):
    """All three gated execution paths must be numerically interchangeable
    (same op order per the module contract): fold-meta + broadcast ranks
    (small edges), shuffled meta + broadcast ranks (mid), and the big-graph
    shuffle-join loop."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 4), (6, 1), (6, 5), (4, 6)]
    fold_broadcast = _run(edges)
    monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
    meta_broadcast = _run(edges)
    monkeypatch.setattr(graph, "BROADCAST_NODE_LIMIT", 0)
    shuffled = _run(edges)
    assert set(fold_broadcast) == set(meta_broadcast) == set(shuffled)
    for v in fold_broadcast:
        assert meta_broadcast[v] == pytest.approx(fold_broadcast[v], abs=1e-12), v
        assert shuffled[v] == pytest.approx(fold_broadcast[v], abs=1e-12), v


def test_node_meta_out_degrees(ray_session):
    edges = [(1, 2), (1, 3), (2, 3)]
    meta = graph.node_meta(_edges_ds(edges).materialize()).to_pandas()
    deg = dict(zip(meta["node"], meta["out_cnt"]))
    assert deg == {1: 2, 2: 1, 3: 0}


def test_graph_components_star_labels(ray_session):
    """q_graph_components end-to-end on sf0.001: the distributed CC loop
    over the per-user star must label every node with the user's
    lexicographic-min event id (independent pandas restatement)."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    got = graph.q_graph_components(sf).to_pandas()
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["user_id", "event_id"]
    )
    ev["node"] = ev["event_id"].astype(str)
    ev = ev[ev.groupby("user_id")["node"].transform("size") >= 2]
    want = dict(zip(ev["node"], ev.groupby("user_id")["node"].transform("min")))
    assert dict(zip(got["node"], got["label"])) == want


def test_pagerank_empty_edges(ray_session):
    ds = graph.pagerank(_edges_ds([]))
    # ray's Dataset.to_pandas drops schema on 0-row results; check via arrow
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == ["node", "rank_n"]
