"""URI canonicalization via distributed edge-dedup + union-find (north rule
stage 5; ≙ CUI assignment + mapping reconciliation in the reference).

Scale shape: linked mentions are arbitrarily many (hot surface forms like
"data" appear everywhere — key skew), but the DISTINCT (surface, cui) edge
set is bounded by the dictionary size. So:

  1. per-batch combiner: distinct edges within each batch (kills ~all volume
     before the shuffle — the salted-groupby effect without a hot key ever
     hitting one reducer),
  2. ``groupby(edge_key)`` over the combined edges → global distinct,
  3. the dimension-sized edge list merges in a single union-find pass
     (SURVEY §7.4: 'small enough to do driver-side'), and the resulting
     surface→URI / cui→URI maps broadcast back for the apply stage.

Canonical URI: component contains a CUI → ``umls:<min-cui>``; else a
surface-derived URI. Deterministic (lexicographic minima throughout).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import PREFIXES
from ..state.broadcast import Broadcast
from ..state.unionfind import UnionFind

_CUI_NODE = "c\x00"
_SURF_NODE = "s\x00"


def distinct_edges_batch(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch distinct (surface, cui) pairs."""
    tbl = batch.select(["surface", "cui"])
    return tbl.group_by(["surface", "cui"]).aggregate([]).rename_columns(["surface", "cui"])


def edge_key_batch(batch: pa.Table) -> pa.Table:
    key = pc.binary_join_element_wise(batch["surface"], batch["cui"], "\x00")
    return batch.append_column("edge_key", key)


def entity_uri_for_surface(surface: str) -> str:
    slug = surface.lower().replace(" ", "_")
    return f"http://sifr-ray.example/entity/{slug}"


def build_canonical_maps(edges: list[tuple[str, str]]) -> dict:
    """Union-find over the distinct bipartite surface↔CUI edges.

    Returns {"surface": {surface→uri}, "cui": {cui→uri}}."""
    uf = UnionFind()
    for surface, cui in edges:
        uf.union(_SURF_NODE + surface, _CUI_NODE + cui)
    members: dict[str, list[str]] = {}
    for node, root in uf.components().items():
        members.setdefault(root, []).append(node)
    surface_map: dict[str, str] = {}
    cui_map: dict[str, str] = {}
    umls_base = PREFIXES["umls"]
    for nodes in members.values():
        cuis = sorted(n[2:] for n in nodes if n.startswith(_CUI_NODE))
        surfaces = sorted(n[2:] for n in nodes if n.startswith(_SURF_NODE))
        if cuis:
            uri = umls_base + cuis[0]
        else:
            uri = entity_uri_for_surface(surfaces[0])
        for c in cuis:
            cui_map[c] = uri
        for s in surfaces:
            surface_map[s] = uri
    return {"surface": surface_map, "cui": cui_map}


class ApplyCanonical:
    """map_batches actor: add ``entity_uri`` from the broadcast maps.
    Arrow-vectorized (index_in hash probe + take); python fallback only for
    the rare surface outside both maps."""

    def __init__(self, maps_bc: Broadcast):
        m = maps_bc.value
        self.skeys = pa.array(list(m["surface"].keys()), pa.string())
        self.svals = pa.array(list(m["surface"].values()), pa.string())
        self.ckeys = pa.array(list(m["cui"].keys()), pa.string())
        self.cvals = pa.array(list(m["cui"].values()), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        surf_uri = pc.take(self.svals, pc.index_in(batch["surface"], value_set=self.skeys))
        if "cui" in batch.column_names and len(self.ckeys):
            cui_uri = pc.take(self.cvals, pc.index_in(batch["cui"], value_set=self.ckeys))
            uris = pc.coalesce(cui_uri, surf_uri)
        else:
            uris = surf_uri
        if pc.any(pc.is_null(uris)).as_py():
            # surfaces outside both maps (unlinked, unseen in edges)
            vals = uris.to_pylist()
            surfaces = batch["surface"].to_pylist()
            vals = [
                v if v is not None else entity_uri_for_surface(s)
                for v, s in zip(vals, surfaces)
            ]
            uris = pa.array(vals, pa.string())
        else:
            uris = uris.combine_chunks() if isinstance(uris, pa.ChunkedArray) else uris
        return batch.append_column("entity_uri", uris)
