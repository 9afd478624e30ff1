"""Flagship pipeline: Common-Crawl-style pages → knowledge-graph triples.

Lifecycle (SURVEY §3.4, north rule):
    read pages Parquet
      → extract (HTML→text, byte-identical per url; skip if populated)
      → mention extraction (dictionary longest-match; ≙ per-class attribute
        extraction M1-M6)
      → fused candidate-gen + entity-link scoring (actor pool; cascade order
        preserved, ≙ J2/J4/M6 + ST2 top-1 K1)
      → canonicalization (distinct-edge combiner + union-find; ≙ CUI
        assignment/reconciliation)
      → triple emission + exact dedup on (subj,pred,obj)
      → partitioned Parquet + per-partition manifests + metrics (≙ S2+S9+S10)

Scale notes:
- ``html`` (the wide binary column) is dropped in the first map_batches.
- page-level triples come from a SEPARATE pruned read (url/warc_ts/lang
  only) — no second pass over html/text.
- the linked-mentions dataset is materialized once and fanned out to the
  four consumers (edges, mention/label triples, cooccurrence, unmatched
  side output); it is orders of magnitude smaller than the input.
- per-mention top-1 is fused into the scoring actor (no groupby(mention_id)
  shuffle); the only all-to-alls are the per-url cooccurrence groupby (high
  cardinality, no hot keys) and the final dedup groupby on the triple hash
  (pre-deduped per batch by a combiner first).
- provenance travels as flat columns (prov_url, prov_ts, prov_rule) and is
  packed into the schema's struct only at the very end (struct columns
  aggregate poorly; flat columns stay zero-copy).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources import parquet_io as pio
from ..stages.canonicalize import ApplyCanonical, build_canonical_maps
from ..stages.link import MentionLinker, build_link_tables
from ..state import manifest as mf
from ..state.broadcast import Broadcast
from ..state.grouped import dataset_from_table

PRED_TYPE = "rdf:type"
PRED_LANG = "dc:language"
PRED_MENTIONS = "sifr:mentions"
PRED_COOCCURS = "sifr:cooccursWith"
PRED_REL_BASE = "sifr:rel/"
# relation-term vocabulary for OpenIE-style pattern extraction: a mention of
# one of these between two other mentions yields (A, sifr:rel/<term>, C)
REL_TERMS = frozenset({"join", "merge", "filter", "scan", "sort"})
PRED_PREFLABEL = "skos:prefLabel"
PRED_CUI = "umls:cui"
COOCCUR_BUCKETS = 64
PRED_TUI = "umls:tui"
OBJ_PAGE = "web:Page"

_FLAT_COLS = ["subj", "pred", "obj", "obj_lang", "obj_is_literal", "prov_url", "prov_ts", "prov_rule"]


def _flat_triples(subj, pred, obj, obj_lang, obj_is_literal, prov_url, prov_ts, rule) -> pa.Table:
    n = len(subj)
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.nulls(n, pa.string()).fill_null(pred) if isinstance(pred, str) else pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_lang": pa.array(obj_lang, pa.string()),
            "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(obj_is_literal) if isinstance(obj_is_literal, bool) else pa.array(obj_is_literal, pa.bool_()),
            "prov_url": pa.array(prov_url, pa.string()),
            "prov_ts": pa.array(prov_ts, pa.timestamp("us")),
            "prov_rule": pa.nulls(n, pa.string()).fill_null(rule),
        }
    )


def pack_provenance(batch: pa.Table) -> pa.Table:
    """Flat prov columns → the TRIPLES schema's provenance struct."""
    prov = pa.StructArray.from_arrays(
        [
            batch["prov_url"].combine_chunks(),
            batch["prov_ts"].combine_chunks().cast(pa.timestamp("us")),
            batch["prov_rule"].combine_chunks(),
        ],
        names=["url", "warc_ts", "rule"],
    )
    out = batch.drop_columns(["prov_url", "prov_ts", "prov_rule"])
    return out.append_column("provenance", prov)


def _columns_triples(
    subj: pa.ChunkedArray | pa.Array,
    pred: str,
    obj: pa.ChunkedArray | pa.Array,
    obj_is_literal: bool,
    prov_url,
    prov_ts,
    rule: str,
    obj_lang=None,
) -> pa.Table:
    """Zero-copy assembly of a flat-triples table from arrow columns.
    Constant columns come from nulls+fill_null kernels — building them
    from ``[value] * n`` python lists measured 47× slower (a python-ref
    list per constant column across the whole 19M-triple stream)."""
    n = len(subj)
    return pa.table(
        {
            "subj": subj,
            "pred": pa.nulls(n, pa.string()).fill_null(pred),
            "obj": obj,
            "obj_lang": obj_lang if obj_lang is not None else pa.nulls(n, pa.string()),
            "obj_is_literal": pa.nulls(n, pa.bool_()).fill_null(obj_is_literal),
            "prov_url": prov_url,
            "prov_ts": prov_ts,
            "prov_rule": pa.nulls(n, pa.string()).fill_null(rule),
        }
    )


def _page_triples(batch: pa.Table) -> pa.Table:
    """(url, rdf:type, web:Page) + (url, dc:language, lang) per page —
    vectorized column assembly, no row loop."""
    n = batch.num_rows
    t_type = _columns_triples(
        batch["url"], PRED_TYPE, pa.nulls(n, pa.string()).fill_null(OBJ_PAGE), False,
        batch["url"], batch["warc_ts"], "page",
    )
    tagged = batch.filter(pc.greater(pc.utf8_length(batch["lang"]), 0))
    t_lang = _columns_triples(
        tagged["url"], PRED_LANG, tagged["lang"], True,
        tagged["url"], tagged["warc_ts"], "page",
    )
    return pa.concat_tables([t_type, t_lang])


def _mention_triples(batch: pa.Table) -> pa.Table:
    """(url, sifr:mentions, entity_uri) — deduped within batch."""
    tbl = (
        batch.select(["url", "entity_uri", "warc_ts"])
        .group_by(["url", "entity_uri"])
        .aggregate([("warc_ts", "min")])
    )
    return _columns_triples(
        tbl["url"], PRED_MENTIONS, tbl["entity_uri"], False,
        tbl["url"], tbl["warc_ts_min"], "mention",
    )


def _label_triples(batch: pa.Table) -> pa.Table:
    """(entity_uri, skos:prefLabel, surface) — deduped within batch."""
    tbl = (
        batch.select(["entity_uri", "surface", "url", "warc_ts"])
        .group_by(["entity_uri", "surface"])
        .aggregate([("url", "min"), ("warc_ts", "min")])
    )
    return _columns_triples(
        tbl["entity_uri"], PRED_PREFLABEL, tbl["surface"], True,
        tbl["url_min"], tbl["warc_ts_min"], "label",
    )


def _surface_lookup_arrays(surface_map: dict[str, str]) -> tuple[pa.Array, pa.Array]:
    """Broadcast surface→URI dict as parallel arrays for vectorized
    index_in+take lookups (python-object np.lexsort/dict.map over string
    columns was the dominant emission cost at bench scale)."""
    keys = pa.array(list(surface_map.keys()), pa.string())
    vals = pa.array(list(surface_map.values()), pa.string())
    return keys, vals


def _first_url_per_key(tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    """Deterministic per-batch dedup: ONE hash group_by on the key taking
    the lexicographic min of the PACKED (url \\x1f ts) pair, so the kept
    timestamp always belongs to the kept url's own source row — every
    emitted provenance pair co-occurred in a real page (ADVICE r2; the
    earlier independent min(url), min(ts) could pair a url with another
    page's ts). The pack/unpack is three Arrow kernel passes; the
    two-level group_by+join alternative measured 26× slower (3.4M
    intermediate groups). Timestamp↔string casts are fixed-width and
    lossless for timestamp[us], so string order == chronological order.
    Deterministic at fixed batching; the cross-parallelism contract only
    covers the triple columns (provenance batches differ by block layout
    by construction)."""
    packed = pc.binary_join_element_wise(
        tbl["prov_url"], pc.cast(tbl["prov_ts"], pa.string()), "\x1f"
    )
    res = (
        tbl.select(key_cols)
        .append_column("prov_pack", packed)
        .group_by(key_cols)
        .aggregate([("prov_pack", "min")])
    )
    split = pc.split_pattern(res["prov_pack_min"], "\x1f")
    res = res.drop_columns(["prov_pack_min"])
    res = res.append_column("prov_url", pc.list_element(split, 0))
    res = res.append_column(
        "prov_ts_min", pc.cast(pc.list_element(split, 1), pa.timestamp("us"))
    )
    return res.sort_by([(c, "ascending") for c in key_cols])


class PairTriples:
    """Shuffle-free co-occurrence (≙ the salted-groupby canonicalization
    shuffle of SURVEY §7.3, made unnecessary): each mention row carries its
    page-local successor surface (set at extraction time, where the page is
    atomic), so adjacent-pair triples are derivable row-locally. Both ends
    map to canonical URIs via the broadcast surface map (every surface maps
    to exactly one union-find component, so surface_map[next] IS the
    successor's entity_uri). Pairs with an unlinkable end are dropped.
    Per-batch dedup collapses the pair stream to ~|distinct pairs|.
    Fully Arrow-vectorized (index_in lookup, element-wise min/max, hash
    group_by) — no python-object sorts in the 40M-row emission pass."""

    def __init__(self, maps_bc: Broadcast):
        self.keys, self.vals = _surface_lookup_arrays(maps_bc.value["surface"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = _flat_triples([], PRED_COOCCURS, [], [], False, [], [], "cooccur")
        t = batch.filter(pc.is_valid(batch["next_surface"]))
        if t.num_rows == 0:
            return empty
        b = pc.take(self.vals, pc.index_in(t["next_surface"], value_set=self.keys))
        a = t["entity_uri"]
        ok = pc.and_(pc.is_valid(b), pc.not_equal(a, b))
        t2 = pa.table(
            {"lo": pc.min_element_wise(a, b), "hi": pc.max_element_wise(a, b),
             "prov_url": t["url"], "prov_ts": t["warc_ts"]}
        ).filter(ok)
        if t2.num_rows == 0:
            return empty
        res = _first_url_per_key(t2, ["lo", "hi"])
        m = res.num_rows
        return pa.table(
            {
                "subj": res["lo"],
                "pred": pa.array([PRED_COOCCURS] * m, pa.string()),
                "obj": res["hi"],
                "obj_lang": pa.array([None] * m, pa.string()),
                "obj_is_literal": pa.array([False] * m, pa.bool_()),
                "prov_url": res["prov_url"],
                "prov_ts": res["prov_ts_min"].combine_chunks().cast(pa.timestamp("us")),
                "prov_rule": pa.array(["cooccur"] * m, pa.string()),
            }
        )


class PatternTriples:
    """OpenIE-style pattern extraction, row-local (north rule: dependency-
    pattern triple extraction): a mention whose surface is a RELATION TERM
    and that sits between two other mentions yields
    (uri(prev), sifr:rel/<term>, uri(next)). prev/next surfaces were
    captured at extraction time where the page is atomic — no shuffle; the
    dictionary-bounded output rides the small dedup stream."""

    def __init__(self, maps_bc: Broadcast):
        self.keys, self.vals = _surface_lookup_arrays(maps_bc.value["surface"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = _flat_triples([], "sifr:rel", [], [], False, [], [], "pattern")
        mask = pc.and_(
            pc.and_(pc.is_valid(batch["prev_surface"]), pc.is_valid(batch["next_surface"])),
            pc.is_in(batch["surface"], value_set=pa.array(sorted(REL_TERMS))),
        )
        t = batch.filter(mask)
        if t.num_rows == 0:
            return empty
        a = pc.take(self.vals, pc.index_in(t["prev_surface"], value_set=self.keys))
        c = pc.take(self.vals, pc.index_in(t["next_surface"], value_set=self.keys))
        ok = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(c)), pc.not_equal(a, c))
        n_all = t.num_rows
        preds = pc.binary_join_element_wise(
            pa.array([PRED_REL_BASE] * n_all, pa.string()), t["surface"], ""
        )
        t2 = pa.table(
            {"subj": a, "pred": preds, "obj": c,
             "prov_url": t["url"], "prov_ts": t["warc_ts"]}
        ).filter(ok)
        if t2.num_rows == 0:
            return empty
        res = _first_url_per_key(t2, ["subj", "pred", "obj"])
        m = res.num_rows
        return pa.table(
            {
                "subj": res["subj"],
                "pred": res["pred"],
                "obj": res["obj"],
                "obj_lang": pa.array([None] * m, pa.string()),
                "obj_is_literal": pa.array([False] * m, pa.bool_()),
                "prov_url": res["prov_url"],
                "prov_ts": res["prov_ts_min"].combine_chunks().cast(pa.timestamp("us")),
                "prov_rule": pa.array(["pattern"] * m, pa.string()),
            }
        )


def _umls_triples(cui_map: dict[str, str], mrsty: pa.Table) -> pa.Table:
    """Driver-side tiny table: (uri, umls:cui, cui) + (uri, umls:tui, tui)
    for every CUI observed in the corpus (≙ updateCUIs/updateTUIs,
    OntologyCUIProcessor.java:304-349)."""
    s, p, o = [], [], []
    seen: set[tuple[str, str, str]] = set()
    for cui, uri in sorted(cui_map.items()):
        s.append(uri); p.append(PRED_CUI); o.append(cui)
    # two CUIs merged into one union-find component can share a TUI → the
    # same (uri, umls:tui, tui) twice; this stream skips the global dedup
    # shuffle, so dedup the tiny driver-built table here (ADVICE r1)
    for cui, tui in sorted(zip(mrsty["cui"].to_pylist(), mrsty["tui"].to_pylist())):
        uri = cui_map.get(cui)
        if uri is not None and (uri, PRED_TUI, tui) not in seen:
            seen.add((uri, PRED_TUI, tui))
            s.append(uri); p.append(PRED_TUI); o.append(tui)
    n = len(s)
    return _flat_triples(
        s, p, o, [None] * n, True, ["urn:sifr:dictionary"] * n, [None] * n, "umls"
    )


def _coalesced_edge_keys(b: pa.Table) -> pa.Table:
    t = b.group_by(["surface", "cui"]).aggregate([])  # re-distinct the coalesced batch
    return pa.table({"edge_key": pc.binary_join_element_wise(t["surface"], t["cui"], "\x00")})


DEDUP_BUCKETS = 64


def _add_dedup_bucket(batch: pa.Table) -> pa.Table:
    """tbucket = stable-hash(subj,pred,obj) % B. The final dedup groups by
    BUCKET (B groups total, not one python call per key) and dedups each
    bucket vectorized on the actual (s,p,o) columns — exact, no reliance on
    hash uniqueness.

    The hash is an explicit keyed blake2b (functions.hashing.hash64):
    python's builtin hash() is salt-randomized per process, and pandas'
    hash_pandas_object turned out to hash differently depending on the
    pandas dtype a block converts to (observed: same key, different bucket
    in different tasks → duplicate triples). Only this small pre-deduped
    stream pays the per-row python hash."""
    from ..functions.hashing import hash64

    keys = pc.binary_join_element_wise(
        batch["subj"], batch["pred"], batch["obj"], "\x00"
    ).to_pylist()
    buckets = pa.array([hash64(k) % DEDUP_BUCKETS for k in keys], pa.int32())
    return batch.append_column("tbucket", buckets)


def _first_per_spo(tbl: pa.Table) -> pa.Table:
    """Deterministic first-row-per-(subj,pred,obj): sort by (s,p,o,prov_url)
    then keep first occurrences. Arrow/numpy vectorized; equal (s,p,o) with
    different obj_lang collapse deliberately (Jena set semantics are on the
    object node)."""
    n = tbl.num_rows
    if n <= 1:
        return tbl
    tbl = tbl.sort_by(
        [("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending"),
         ("prov_url", "ascending")]
    )
    # neighbour equality via zero-copy arrow slices (no python-object
    # string comparisons)
    s, p, o = (tbl[c].combine_chunks() for c in ("subj", "pred", "obj"))
    same = pc.and_(
        pc.and_(pc.equal(s.slice(1), s.slice(0, n - 1)),
                pc.equal(p.slice(1), p.slice(0, n - 1))),
        pc.equal(o.slice(1), o.slice(0, n - 1)),
    )
    mask = pa.concat_arrays([pa.array([True]), pc.invert(same)])
    return tbl.filter(mask)


def _dedup_batch(batch: pa.Table) -> pa.Table:
    return _first_per_spo(batch)


def _dedup_group(group: pa.Table) -> pa.Table:
    return _first_per_spo(group)


def _latest_page_bucket(df):
    """Per url keep the row with max warc_ts (latest recrawl). Runs inside
    a hash(url) bucket, vectorized — all rows of a url share a bucket.
    ``na_position='first'``: a null warc_ts (parse_warc emits None for an
    unparseable WARC-Date) must never beat a real timestamp — NaT sorts
    LAST by default and tail(1) would keep it. ``dropna=False`` keeps
    null-url rows instead of silently deleting them."""
    df = df.sort_values(["url", "warc_ts"], kind="stable", na_position="first")
    return df.groupby("url", sort=False, dropna=False).tail(1)


def build_kg(
    pages_path: str,
    mrconso: pa.Table,
    mrsty: pa.Table,
    *,
    out_dir: str | None = None,
    num_parts: int = 16,
    concurrency: int | tuple[int, int] | None = None,
    actor_num_cpus: float = 0.5,
    extract_batch_size: int = 512,
    link_batch_size: int = 4096,
    read_blocks: int | None = None,
    pack_struct: bool = True,
    dedup_pages: bool = False,
) -> "rd.Dataset":
    """Run the flagship KG-construction pipeline; returns the triples
    Dataset (also written partitioned+manifested when ``out_dir`` given)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if concurrency is None:
        # the linker pool does CPU-bound python work → one full core per
        # actor, ~60% of the node; the vectorized light pools run at 0.5
        # CPU so they interleave with the stateless read/write tasks.
        # Below 6 cpus, ncpu-4 would reserve EVERY core and hang the
        # streaming executor — pool_size always leaves one unreserved.
        from ..state.partitions import pool_size

        concurrency = pool_size(ncpu)
    if read_blocks is None:
        # a single pages file otherwise reads as ONE task (Ray splits
        # blocks only after the read) — measured 11.2 s serial vs 1.2 s
        # split for 800k pages; the fixture writes 4096-row groups so the
        # file is row-group splittable
        read_blocks = 4 * ncpu

    import time as _time

    _phase_log = bool(os.environ.get("GRAFT_KG_PHASE_LOG"))

    def _phase(name: str, t0: float) -> float:
        t1 = _time.perf_counter()
        if _phase_log:
            import sys as _sys

            print(f"[kg-phase] {name}: {t1 - t0:.2f}s", file=_sys.stderr)
        return t1

    _t = _time.perf_counter()
    tables = build_link_tables(mrconso)
    tables_bc = Broadcast.put(tables)
    _t = _phase("tables", _t)

    # lang rides only in the separate page_meta read below — pruned here
    pages = pio.read_parquet(
        pages_path, columns=["url", "warc_ts", "html", "text"],
        override_num_blocks=read_blocks,
    )
    if dedup_pages:
        # recrawl handling (real at CC scale: the same url appears in many
        # WARC segments): latest crawl wins per url. OPT-IN because it
        # shuffles the full page payload once — prefer deduping at ingest
        # (pages_exact_dedup / curation) when the corpus is prepared ahead.
        # Contract: (url, warc_ts) identifies a crawl record — rows sharing
        # both are assumed identical, so the max-ts pick is deterministic
        # and the linker and page_meta paths (below) select the SAME row.
        from ..state.grouped import bucketed_map_groups

        pages = bucketed_map_groups(pages, ["url"], _latest_page_bucket)

    # FUSED extract→mention→link actor stage: one pool, no inter-stage
    # row transfer, lazy context windows (see MentionLinker docstring).
    # Extraction runs INSIDE the pool — a separate extract stage would be
    # limited to the few cores the pool leaves free and starve the actors
    # (this was round 2's scaling ceiling: link phase 2.2× at 4× cpus).
    # emit_edge_partials=True: the canonicalization edge combiner runs
    # inside the pool (per-block distinct rows tagged position = -1), so
    # the post-barrier DRAM-bound hash pass over the full mention stream
    # disappears (BASELINE.md strong-scaling cost (b)).
    # Ray Data's per-operator resource reservation splits the CPU budget
    # between the (trivial) read and the linker pool, starving half the
    # actors for seconds at stage start (timestamped: INIT at +2 s, first
    # task at +7 s on 32 cpus). The pool IS the pipeline here, so drop
    # the reservation for this execution; restored in finally (interleaved
    # A/B: 15.0 → 12.6 s for the 100k-page build, +18% throughput).
    # OVERLAP: page triples depend on nothing downstream of the linker, so
    # their read+emit+materialize runs on a side thread STARTED BEFORE the
    # linker barrier (VERDICT r4 #8): the page-meta read + emit overlaps
    # the linker execution itself (it fills the handful of cores the pool
    # leaves free), and keeps overlapping the driver's edge collect +
    # union-find after it — A/B at 100k pages/32cpus: pages_thread_join
    # 0.68 s after the barrier -> ~0 s started here, total unchanged-or-
    # better; the win grows with page count.
    #
    # Version pin (ADVICE r3): this relies on TWO DISTINCT Datasets
    # executing concurrently from one driver, each on its own thread with
    # its own StreamingExecutor — supported on ray[data] 2.49 (each
    # execution owns its executor; no Dataset object is shared across
    # threads). Exercised by every build_kg test. The linker + edge-collect
    # sections below run under try/finally so an error on the main path
    # still joins the side thread before propagating — no orphaned
    # concurrent execution.
    import threading

    page_meta = pio.read_parquet(
        pages_path, columns=["url", "warc_ts", "lang"],
        override_num_blocks=read_blocks,
    )
    if dedup_pages:
        from ..state.grouped import bucketed_map_groups

        page_meta = bucketed_map_groups(page_meta, ["url"], _latest_page_bucket)
    _pages_box: dict = {}

    def _materialize_pages():
        try:
            _pages_box["ds"] = page_meta.map_batches(
                _page_triples, batch_format="pyarrow"
            ).materialize()
        except BaseException as exc:  # re-raised on join
            _pages_box["err"] = exc

    _pages_th = threading.Thread(target=_materialize_pages, daemon=True)
    _pages_th.start()

    _rctx = rd.DataContext.get_current()
    _prev_reservation = _rctx.op_resource_reservation_enabled
    _rctx.op_resource_reservation_enabled = False
    try:
        linked_all = pages.map_batches(
            MentionLinker,
            fn_constructor_args=(tables_bc, False, True),  # no diagnostics; edge partials
            batch_format="pyarrow",
            batch_size=extract_batch_size,
            concurrency=concurrency,
            num_cpus=1,
        ).materialize()  # consumed by edges + unmatched + entities; ≪ input size
    except BaseException:
        _pages_th.join()  # never orphan the concurrent page execution
        raise
    finally:
        _rctx.op_resource_reservation_enabled = _prev_reservation
    _t = _phase("linker", _t)

    # batch_size=None (whole blocks) everywhere below the linker: the
    # page-atomic block invariant (see comment further down) must survive
    # every intermediate stage, so nothing may re-batch across block edges
    linked = linked_all.map_batches(
        lambda b: b.filter(
            pc.and_(pc.is_valid(b["cui"]), pc.greater_equal(b["position"], 0))
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    unmatched = linked_all.map_batches(
        lambda b: b.filter(pc.is_null(b["cui"])).drop_columns(["cui", "next_surface"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    try:
        # --- canonicalization: distinct edges → union-find → broadcast maps ---
        # the per-block distinct combiner already ran inside the linker pool;
        # this pass only selects the tagged partial rows (a cheap filter on one
        # int column of the materialized blocks) and COALESCES them so
        # unique()'s shuffle sees a handful of blocks, not one per linker block
        edge_keys = (
            linked_all.map_batches(
                lambda b: b.filter(pc.equal(b["position"], -1)).select(["surface", "cui"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            .map_batches(
                _coalesced_edge_keys,
                batch_format="pyarrow",
                batch_size=262144,
            )
            .unique("edge_key")
        )
        # unique() on an empty dataset can yield [None] — guard it
        edges = [tuple(k.split("\x00", 1)) for k in (edge_keys or []) if k]
        maps = build_canonical_maps(edges)
        maps_bc = Broadcast.put(maps)

        # PAGE-ATOMIC BLOCK INVARIANT: a page is ONE ROW until extraction, so
        # each MentionLinker input batch holds whole pages and its output block
        # holds all mention rows of those pages. Every stage from here to the
        # mention-triple emitter uses batch_size=None (whole blocks), so a url
        # never spans two batches and per-batch (url, entity) dedup is GLOBALLY
        # exact — mention triples skip the dedup shuffle entirely. Blocks stay
        # far below target_max_block_size, so Ray does not re-split them.
        #
        # Canonicalization is FUSED into each emitter branch (canonical-map
        # application is a cheap vectorized dict lookup) instead of
        # materializing a second 'entities' copy of the linked stream — at
        # scale that saves one full write+read of the mention volume through
        # the object store.
        apply_canon = ApplyCanonical(maps_bc)
        _t = _phase("edges+unionfind", _t)
    finally:
        # join on success AND error paths (ADVICE r3): never leave the
        # page-triple execution orphaned behind a raised exception
        _pages_th.join()
    _t = _phase("pages_thread_join", _t)

    # --- triple emission -------------------------------------------------
    if "err" in _pages_box:
        raise _pages_box["err"]
    t_pages = _pages_box["ds"]

    def _emit_main(b: pa.Table) -> pa.Table:
        return _mention_triples(apply_canon(b))

    t_mentions = linked.map_batches(
        _emit_main, batch_format="pyarrow", batch_size=None
    )

    pair_emitter = PairTriples(maps_bc)
    pattern_emitter = PatternTriples(maps_bc)

    def _emit_small(b: pa.Table) -> pa.Table:
        ents = apply_canon(b)
        return pa.concat_tables(
            [_label_triples(ents), pair_emitter(ents), pattern_emitter(ents)]
        )

    t_small = linked.map_batches(_emit_small, batch_format="pyarrow", batch_size=None)
    t_umls = dataset_from_table(_umls_triples(maps["cui"], mrsty))

    # page triples (unique urls) and mention triples (page-atomic blocks,
    # see invariant above) are distinct by construction — only the small
    # label/cooccur/umls streams need the global dedup shuffle
    # The small stream arrives as ~one tiny block per upstream block; a
    # sort-shuffle over thousands of 10-row blocks pays per-task overhead
    # thousands of times (observed: 194s to dedup 24k rows at 8 cpus). The
    # big batch_size COALESCES blocks while deduping so the groupby sees a
    # handful of blocks. The umls triples are distinct by construction
    # (driver-built from the dictionary, unique preds) and skip dedup
    # entirely.
    deduped_small = (
        t_small
        .map_batches(_dedup_batch, batch_format="pyarrow", batch_size=262144)
        .map_batches(_add_dedup_bucket, batch_format="pyarrow", batch_size=262144)
        .groupby("tbucket")
        .map_groups(_dedup_group, batch_format="pyarrow")
        .drop_columns(["tbucket"])
    )
    triples = t_pages.union(t_mentions, deduped_small, t_umls)
    if pack_struct:
        triples = triples.map_batches(pack_provenance, batch_format="pyarrow")

    if out_dir is not None:
        written = mf.write_partitioned(triples, out_dir, key_col="subj", num_parts=num_parts)
        unmatched.write_parquet(out_dir + "/_unmatched")
        out_ds = mf.read_output(out_dir)

        # per-rule triple counts (≙ the stats counters S9/A6) from the
        # already-written output — one cheap pass over parquet on disk
        def rule_col(b: pa.Table) -> pa.Table:
            if "provenance" in b.column_names:
                rule = pc.struct_field(b["provenance"], "rule")
            else:
                rule = b["prov_rule"]
            return pa.table({"rule": rule})

        from ray.data.aggregate import Count

        rule_counts = {
            r["rule"]: r["n"]
            for r in out_ds.map_batches(rule_col, batch_format="pyarrow")
            .groupby("rule")
            .aggregate(Count(alias_name="n"))
            .take_all()
        }
        mf.write_metrics(
            out_dir,
            {
                "partitions_written": sorted(written),
                "num_edges": len(edges),
                "num_entities": len(set(maps["surface"].values()) | set(maps["cui"].values())),
                "triples_by_rule": rule_counts,
                "num_triples": int(sum(rule_counts.values())),
            },
        )
        return out_ds
    return triples


def kg_snapshot_delta(
    pages_a: str,
    pages_b: str,
    mrconso: pa.Table,
    mrsty: pa.Table,
    **build_kw,
) -> "rd.Dataset":
    """Incremental KG update between two crawl snapshots: (subj, pred,
    obj, change) with change ∈ {added, removed} — the triples a
    re-materialization against snapshot B would add to / retire from the
    snapshot-A graph. This is the operational form of the north rule's
    periodic re-crawl: downstream consumers apply the delta instead of
    re-reading the full adjacency.

    Diff = ONE bucketed presence-flag shuffle over the two triple
    streams (side tag + per-key min/max reduce — same machinery as the
    relational ``snapshot_delta``), which is the floor for an exact diff:
    each snapshot's triples cross the wire once, partitioned by (s, p, o).
    Exactness is driver-gated by ``kg_delta_pr`` against the sequential
    oracle diff (tools/kg_oracle.py on each half)."""
    import pandas as pd

    from ..state.grouped import bucketed_map_groups

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {"subj": b["subj"], "pred": b["pred"], "obj": b["obj"],
                 "side": pa.nulls(b.num_rows, pa.int64()).fill_null(side)}
            )

        return f

    ta = build_kg(pages_a, mrconso, mrsty, **build_kw)
    tb = build_kg(pages_b, mrconso, mrsty, **build_kw)
    u = ta.map_batches(tag(0), batch_format="pyarrow").union(
        tb.map_batches(tag(1), batch_format="pyarrow")
    )

    def diff(df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        g = df.groupby(["subj", "pred", "obj"], as_index=False)["side"].agg(
            ["min", "max"]
        )
        only_b = g["min"].to_numpy() == 1
        only_a = g["max"].to_numpy() == 0
        out = g.loc[only_b | only_a, ["subj", "pred", "obj"]].copy()
        out["change"] = np.where(only_b[only_b | only_a], "added", "removed")
        return out

    return bucketed_map_groups(u, ["subj", "pred", "obj"], diff)
