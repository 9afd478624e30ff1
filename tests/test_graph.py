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
    # rank_n is contractually rounded to 4 decimals (session-9 ulp fix) —
    # the sequential reference rounds the same way
    from sifr_project_java_ontology_processing_ray.functions.numeric import round_sql

    for v in want:
        assert got[v] == pytest.approx(float(round_sql(want[v], 4)), abs=1e-12), v


def test_pagerank_dangling_mass_conserved(ray_session):
    # star into a single sink: every rank unit flows through the dangling
    # redistribution each round; total mass must stay exactly 1 (= N after
    # the ×N scaling)
    edges = [(i, 99) for i in range(1, 9)]
    got = _run(edges)
    # 4-dp output rounding: mass conservation holds to grid resolution
    assert sum(got.values()) == pytest.approx(len(got), abs=5e-4 * len(got))
    want = _seq_pagerank(edges)
    from sifr_project_java_ontology_processing_ray.functions.numeric import round_sql

    for v in want:
        assert got[v] == pytest.approx(float(round_sql(want[v], 4)), abs=1e-12)
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
    # over-partitioned shuffle: more hash partitions than nodes forces the
    # empty zero-column aggregate blocks the round maps must guard against
    monkeypatch.setattr(graph, "join_partitions", lambda rows=None: 16)
    shuffled_sparse = _run(edges)
    assert (
        set(fold_broadcast) == set(meta_broadcast)
        == set(shuffled) == set(shuffled_sparse)
    )
    for v in fold_broadcast:
        assert meta_broadcast[v] == pytest.approx(fold_broadcast[v], abs=1e-12), v
        assert shuffled[v] == pytest.approx(fold_broadcast[v], abs=1e-12), v
        assert shuffled_sparse[v] == pytest.approx(fold_broadcast[v], abs=1e-12), v


def test_pagerank_checkpoint_resume(ray_session, monkeypatch, tmp_path):
    """A checkpointed run interrupted mid-loop resumes from the highest
    completed round and lands bit-identical to an uninterrupted run —
    both execution paths."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 4), (6, 1), (6, 5), (4, 6)]
    want = _run(edges)

    for tag, force_shuffle in (("bc", False), ("sh", True)):
        if force_shuffle:
            monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
            monkeypatch.setattr(graph, "BROADCAST_NODE_LIMIT", 0)
        ck = str(tmp_path / tag)
        # phase 1: run only 2 of the 5 rounds (simulated interruption)
        df = graph.pagerank(_edges_ds(sorted(set(edges))), iters=2,
                            checkpoint_dir=ck).to_pandas()
        assert len(df) == 6
        # phase 2: full run against the same dir — resumes at round 2
        df = graph.pagerank(_edges_ds(sorted(set(edges))), iters=5,
                            checkpoint_dir=ck).to_pandas()
        got = dict(zip(df["node"], df["rank_n"]))
        assert got == want, tag  # bit-identical, not approx
        # rounds 3..5 were checkpointed by the resumed run
        import os

        marker = (lambda k: os.path.join(ck, f"round_{k}.npy")) if not force_shuffle \
            else (lambda k: os.path.join(ck, f"round_{k}", "_complete"))
        assert all(os.path.exists(marker(k)) for k in (1, 2, 3, 4, 5)), tag


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


def _seq_bfs(edges: list[tuple[int, int]], source: int, rounds: int = 4):
    """Dense sequential restatement: bounded undirected Bellman relaxation."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    dist = {v: None for v in nodes}
    if source in dist:
        dist[source] = 0
    sym = set(edges) | {(v, u) for u, v in edges}
    for _ in range(rounds):
        new = dict(dist)
        for u, v in sym:
            if dist[u] is not None and (new[v] is None or dist[u] + 1 < new[v]):
                new[v] = dist[u] + 1
        dist = new
    return {v: d for v, d in dist.items() if d is not None}


def test_bfs_levels_match_sequential(ray_session, monkeypatch):
    # two lobes joined by a bridge + an unreachable island; rounds=4 cuts
    # the far lobe mid-propagation — both paths must agree with the
    # sequential restatement INCLUDING the cut-off frontier
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
             (2, 9), (9, 4), (50, 51)]
    want = _seq_bfs(edges, source=1)
    broadcast = dict(
        zip(*[graph.bfs_levels(_edges_ds(edges), 1).to_pandas()[c]
              for c in ("node", "level")])
    )
    assert broadcast == want
    monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
    shuffled = dict(
        zip(*[graph.bfs_levels(_edges_ds(edges), 1).to_pandas()[c]
              for c in ("node", "level")])
    )
    assert shuffled == want
    assert 50 not in want and 8 not in want  # island + beyond-4-hops cut


def test_bfs_levels_empty_and_missing_source(ray_session):
    assert graph.bfs_levels(_edges_ds([]), 1).count() == 0
    # source absent from the graph → nothing reached
    assert graph.bfs_levels(_edges_ds([(2, 3)]), 99).count() == 0


def test_pagerank_empty_edges(ray_session):
    ds = graph.pagerank(_edges_ds([]))
    # ray's Dataset.to_pandas drops schema on 0-row results; check via arrow
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == ["node", "rank_n"]


def _und_edges_ds(pairs: list[tuple[int, int]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {"a": pa.array([min(p) for p in pairs], pa.int64()),
             "b": pa.array([max(p) for p in pairs], pa.int64())}
        )
    )


class TestTriangles:
    def test_k4_has_four_triangles(self, ray_session):
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        df = graph.triangle_count(_und_edges_ds(k4)).to_pandas()
        assert df.iloc[0].to_dict() == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}

    def test_star_has_none(self, ray_session):
        star = [(0, k) for k in range(1, 8)]
        df = graph.triangle_count(_und_edges_ds(star)).to_pandas()
        assert int(df["n_triangles"][0]) == 0

    def test_matches_brute_force(self, ray_session):
        """Random graph vs O(n^3) enumeration — pins the rank-orientation
        wedge algebra (each triangle counted exactly once)."""
        import itertools
        import random

        rng = random.Random(5)
        nodes = list(range(30))
        pairs = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
        )
        adj = set(pairs)
        want = sum(
            1
            for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in adj and (y, z) in adj and (x, z) in adj
        )
        df = graph.triangle_count(_und_edges_ds(pairs)).to_pandas()
        assert int(df["n_triangles"][0]) == want

    def test_shuffle_path_agrees(self, ray_session, monkeypatch):
        """Forcing the join-based orientation AND the shuffled closing
        check yields the same census as the broadcast fast paths."""
        rngpairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (0, 4)]
        want = graph.triangle_count(_und_edges_ds(rngpairs)).to_pandas()
        monkeypatch.setattr(graph, "BROADCAST_NODE_LIMIT", 0)
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        got = graph.triangle_count(_und_edges_ds(rngpairs)).to_pandas()
        assert got.equals(want)

    def test_chunked_close_agrees(self, ray_session, monkeypatch):
        """A ~1-wedge chunk budget (maximal chunk count, every group its
        own emit+probe round) must census and credit identically to the
        single-chunk fast case — pins the group-aligned chunk cuts and
        the per-chunk credit recombination in _close_slice_task."""
        import random

        rng = random.Random(11)
        nodes = list(range(40))
        pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(200)})
        want_t = graph.triangle_count(_und_edges_ds(pairs)).to_pandas()
        want_c = graph.clustering_coefficient(_und_edges_ds(pairs)).to_pandas()
        monkeypatch.setattr(graph, "_CLOSE_CHUNK_WEDGES", 1)
        got_t = graph.triangle_count(_und_edges_ds(pairs)).to_pandas()
        got_c = graph.clustering_coefficient(_und_edges_ds(pairs)).to_pandas()
        assert got_t.equals(want_t)
        assert got_c.equals(want_c)


class TestIterativeCheckpoints:
    """CC and BFS loops resume from the highest completed round and land
    identical to uninterrupted runs on both execution paths (pagerank has
    its own test above); a converged marker short-circuits the loop."""

    EDGES = [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (8, 6), (9, 1)]

    def _cc(self, tmp, **kw):
        import pyarrow as pa
        import ray.data as rd

        from sifr_project_java_ontology_processing_ray.state.components import connected_components

        ds = rd.from_arrow(
            pa.table(
                {"a": pa.array([f"n{a}" for a, _ in self.EDGES], pa.string()),
                 "b": pa.array([f"n{b}" for _, b in self.EDGES], pa.string())}
            )
        )
        df = connected_components(ds, max_rounds=5, **kw).to_pandas()
        return dict(zip(df["node"], df["label"]))

    @pytest.mark.parametrize("force_shuffle", [False, True])
    def test_cc_resume(self, ray_session, tmp_path, force_shuffle):
        import os

        kw = (
            {"broadcast_limit": 0, "edge_fold_limit": 0}
            if force_shuffle
            else {}
        )
        want = self._cc(tmp_path)
        ck = str(tmp_path / ("sh" if force_shuffle else "bc"))
        got = self._cc(tmp_path, checkpoint_dir=ck, **kw)
        assert got == want
        assert os.path.exists(os.path.join(ck, "_converged"))
        # rerun against the converged dir: loop is skipped, output identical
        got2 = self._cc(tmp_path, checkpoint_dir=ck, **kw)
        assert got2 == want

    @pytest.mark.parametrize("force_shuffle", [False, True])
    def test_bfs_resume(self, ray_session, tmp_path, monkeypatch, force_shuffle):
        edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 7)]
        if force_shuffle:
            monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
        want = graph.bfs_levels(_edges_ds(edges), source=1, rounds=4).to_pandas()
        want = dict(zip(want["node"], want["level"]))
        ck = str(tmp_path / ("sh" if force_shuffle else "bc"))
        # phase 1: 2 of 4 rounds (simulated interruption)
        graph.bfs_levels(_edges_ds(edges), source=1, rounds=2, checkpoint_dir=ck)
        # phase 2: resumed full run
        df = graph.bfs_levels(
            _edges_ds(edges), source=1, rounds=4, checkpoint_dir=ck
        ).to_pandas()
        assert dict(zip(df["node"], df["level"])) == want


class TestClusteringCoefficient:
    PAIRS = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (0, 4), (4, 5)]

    def _brute(self):
        import itertools

        adj: dict[int, set[int]] = {}
        for a, b in self.PAIRS:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for v, nb in adj.items():
            if len(nb) < 2:
                continue
            t = sum(
                1 for x, y in itertools.combinations(sorted(nb), 2)
                if y in adj[x]
            )
            want[v] = (len(nb), t, 2.0 * t / (len(nb) * (len(nb) - 1)))
        return want

    def test_matches_brute_force(self, ray_session):
        df = graph.clustering_coefficient(_und_edges_ds(self.PAIRS)).to_pandas()
        got = {
            int(r.node): (int(r.deg), int(r.n_tri), float(r.coeff))
            for r in df.itertuples()
        }
        assert got == self._brute()

    def test_shuffle_path_agrees(self, ray_session, monkeypatch):
        want = graph.clustering_coefficient(_und_edges_ds(self.PAIRS)).to_pandas()
        want = want.sort_values("node").reset_index(drop=True)
        monkeypatch.setattr(graph, "BROADCAST_NODE_LIMIT", 0)
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        got = graph.clustering_coefficient(_und_edges_ds(self.PAIRS)).to_pandas()
        got = got.sort_values("node").reset_index(drop=True)
        assert got.equals(want)


class TestKCore:
    def test_clique_plus_pendant_chain(self, ray_session):
        """K5 with a pendant path: k=4 peels the path (cascading through
        its joint) and keeps exactly the clique at degree 4."""
        k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        chain = [(4, 10), (10, 11), (11, 12)]
        df = (
            graph.kcore(_und_edges_ds(k5 + chain), k=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert df["node"].tolist() == [0, 1, 2, 3, 4]
        assert df["core_deg"].tolist() == [4] * 5

    def test_full_collapse_returns_empty(self, ray_session):
        star = [(0, k) for k in range(1, 6)]
        df = graph.kcore(_und_edges_ds(star), k=2).to_pandas()
        assert len(df) == 0

    def test_matches_sequential_peel(self, ray_session):
        import random

        rng = random.Random(11)
        nodes = list(range(40))
        pairs = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(200)}
        )
        want = {}
        cur = set(pairs)
        for _ in range(graph.KCORE_ROUNDS):
            deg: dict[int, int] = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            bad = {v for v, d in deg.items() if d < 5}
            if not bad:
                break
            cur = {(a, b) for a, b in cur if a not in bad and b not in bad}
        for a, b in cur:
            want[a] = want.get(a, 0) + 1
            want[b] = want.get(b, 0) + 1
        df = graph.kcore(_und_edges_ds(pairs), k=5).to_pandas()
        got = dict(zip(df["node"], df["core_deg"]))
        assert got == want

    def test_shuffle_path_agrees(self, ray_session, monkeypatch):
        import random

        rng = random.Random(12)
        nodes = list(range(30))
        pairs = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(150)}
        )
        want = (
            graph.kcore(_und_edges_ds(pairs), k=6)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        got = (
            graph.kcore(_und_edges_ds(pairs), k=6)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert got.equals(want)


def _dir_edges_ds(pairs: list[tuple[int, int]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {"src": pa.array([p[0] for p in pairs], pa.int64()),
             "dst": pa.array([p[1] for p in pairs], pa.int64())}
        )
    )


class TestHits:
    EDGES = [(1, 10), (1, 11), (2, 10), (2, 12), (3, 11), (3, 12), (3, 13),
             (4, 13), (5, 10), (5, 13)]

    @staticmethod
    def _seq_hits(pairs, iters=graph.HITS_ITERS):
        import numpy as np

        nodes = sorted({v for p in pairs for v in p})
        pos = {v: i for i, v in enumerate(nodes)}
        h = np.ones(len(nodes))
        a = np.zeros(len(nodes))
        for _ in range(iters):
            a[:] = 0.0
            for s, d in pairs:
                a[pos[d]] += h[pos[s]]
            z = np.sqrt((a * a).sum())
            if z > 0:
                a /= z
            h[:] = 0.0
            for s, d in pairs:
                h[pos[s]] += a[pos[d]]
            z = np.sqrt((h * h).sum())
            if z > 0:
                h /= z
        n = float(len(nodes))
        return {v: (h[pos[v]] * n, a[pos[v]] * n) for v in nodes}

    def test_matches_sequential(self, ray_session):
        want = self._seq_hits(self.EDGES)
        df = graph.hits(_dir_edges_ds(self.EDGES)).to_pandas()
        assert len(df) == len(want)
        from sifr_project_java_ontology_processing_ray.functions.numeric import round_sql

        # hub_n/auth_n are contractually 4-dp rounded (session-9 ulp fix)
        for _, r in df.iterrows():
            wh, wa = want[int(r["node"])]
            assert abs(r["hub_n"] - float(round_sql(wh, 4))) < 1e-9
            assert abs(r["auth_n"] - float(round_sql(wa, 4))) < 1e-9

    def test_fold_path_agrees(self, ray_session, monkeypatch):
        """Driver-numpy path (default here) vs the per-round edge-scan
        fold path (edges gate off)."""
        want = (
            graph.hits(_dir_edges_ds(self.EDGES))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        got = (
            graph.hits(_dir_edges_ds(self.EDGES))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert got["node"].tolist() == want["node"].tolist()
        assert np.allclose(got["hub_n"], want["hub_n"], atol=1e-9)
        assert np.allclose(got["auth_n"], want["auth_n"], atol=1e-9)

    def test_shuffle_path_agrees(self, ray_session, monkeypatch):
        want = (
            graph.hits(_dir_edges_ds(self.EDGES))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
        monkeypatch.setattr(graph, "BROADCAST_NODE_LIMIT", 0)
        got = (
            graph.hits(_dir_edges_ds(self.EDGES))
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert got["node"].tolist() == want["node"].tolist()
        assert np.allclose(got["hub_n"], want["hub_n"], atol=1e-9)
        assert np.allclose(got["auth_n"], want["auth_n"], atol=1e-9)

    def test_empty_edges(self, ray_session):
        df = graph.hits(_dir_edges_ds([])).to_pandas()
        assert len(df) == 0


class TestAssortativity:
    def test_matches_numpy_reference(self, ray_session):
        import random

        rng = random.Random(21)
        nodes = list(range(25))
        pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)})
        a = np.array([p[0] for p in pairs]); b = np.array([p[1] for p in pairs])
        ns, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
        da = cnt[np.searchsorted(ns, a)].astype(float)
        db = cnt[np.searchsorted(ns, b)].astype(float)
        x = np.concatenate([da, db]); y = np.concatenate([db, da])
        want = np.corrcoef(x, y)[0, 1]
        df = graph.assortativity(_und_edges_ds(pairs)).to_pandas()
        assert int(df["n_edges"][0]) == len(pairs)
        assert abs(df["assortativity"][0] - want) < 1e-9

    def test_shuffle_path_agrees(self, ray_session, monkeypatch):
        import random

        rng = random.Random(22)
        nodes = list(range(30))
        pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
        want = graph.assortativity(_und_edges_ds(pairs)).to_pandas()
        monkeypatch.setattr(graph, "EDGE_BROADCAST_LIMIT", 0)
        got = graph.assortativity(_und_edges_ds(pairs)).to_pandas()
        assert got.equals(want)


def _wedges_ds(edges: list[tuple[int, int, int]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _, _ in edges], pa.int64()),
                "dst": pa.array([v for _, v, _ in edges], pa.int64()),
                "w": pa.array([w for _, _, w in edges], pa.int64()),
            }
        )
    )


def _seq_sssp(edges: list[tuple[int, int, int]], source: int, rounds: int = 4):
    """Dense sequential restatement: bounded undirected min-plus relaxation."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    dist = {v: None for v in nodes}
    if source in dist:
        dist[source] = 0
    sym = list(edges) + [(v, u, w) for u, v, w in edges]
    for _ in range(rounds):
        new = dict(dist)
        for u, v, w in sym:
            if dist[u] is not None and (new[v] is None or dist[u] + w < new[v]):
                new[v] = dist[u] + w
        dist = new
    return {v: d for v, d in dist.items() if d is not None}


class TestSSSP:
    # weighted diamond where the heavier direct edge loses to the 2-hop
    # path, plus a chain cut mid-propagation at rounds=4, plus an island
    EDGES = [(1, 2, 10), (1, 3, 1), (3, 2, 2), (2, 4, 1), (4, 5, 5),
             (5, 6, 1), (6, 7, 1), (7, 8, 1), (60, 61, 3)]

    def _run(self, **kw):
        df = graph.sssp_distances(_wedges_ds(self.EDGES), 1, **kw).to_pandas()
        return dict(zip(df["node"], df["dist"]))

    def test_matches_sequential_both_paths(self, ray_session, monkeypatch):
        want = _seq_sssp(self.EDGES, source=1)
        assert want[2] == 3  # 2-hop 1→3→2 beats the weight-10 direct edge
        assert self._run() == want
        monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
        assert self._run() == want

    def test_empty_and_missing_source(self, ray_session):
        assert graph.sssp_distances(_wedges_ds([]), 1).count() == 0
        assert graph.sssp_distances(_wedges_ds([(2, 3, 1)]), 99).count() == 0

    @pytest.mark.parametrize("force_shuffle", [False, True])
    def test_resume(self, ray_session, tmp_path, monkeypatch, force_shuffle):
        if force_shuffle:
            monkeypatch.setattr(graph, "META_FOLD_EDGE_LIMIT", 0)
        want = self._run(rounds=4)
        ck = str(tmp_path / ("sh" if force_shuffle else "bc"))
        self._run(rounds=2, checkpoint_dir=ck)  # simulated interruption
        assert self._run(rounds=4, checkpoint_dir=ck) == want
