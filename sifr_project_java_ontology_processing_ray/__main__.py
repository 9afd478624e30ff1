"""CLI entry points (≙ the reference's main() CLIs + .properties/POSIX
flags, SURVEY §2.10). Flags preserve the reference's names:

  enrich:   -dc disambiguate, -mc match-missing, -cpl code-to-preflabel,
            -hn history note, -l LANG   (CUIProcessorCommandlineHandler)
  generate: -d dictionary, -cr corpus-raw, -cs corpus-std, -a adapted,
            -mfc most-frequent-code    (SKOSGeneratorCommandlineHandler,
            incl. the -a ⊥ -mfc and -a ⇒ -cr ∧ -cs validation)
  kg:       the flagship web pipeline
  clean:    multilingual cleaning (-l target language)

Run:  python -m sifr_project_java_ontology_processing_ray <cmd> [...]

Owns the Ray session (scripts own sessions; library code never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_RAY_OWNED = False  # shut down only a session THIS process created


def _ray_init_kwargs(addr: str, num_cpus: int | None) -> dict:
    """ray.init kwargs for the two deployment modes (north rule: the same
    CLI is the ``ray job submit`` entrypoint on a multi-node cluster).

    - ``local`` (the sandbox / laptop default): start an in-process Ray,
      where ``num_cpus`` and ``include_dashboard`` are valid.
    - anything else (``auto`` or a ``ray://``/host:port address, which is
      what ``ray job submit`` exports as $RAY_ADDRESS): CONNECT to the
      existing cluster — resource limits belong to the cluster config, so
      ``num_cpus``/``include_dashboard`` must not be passed."""
    kwargs: dict = {
        "address": addr,
        "ignore_reinit_error": True,
        "logging_level": "ERROR",
    }
    if addr == "local":
        kwargs["num_cpus"] = num_cpus
        kwargs["include_dashboard"] = False
    return kwargs


def _init_ray(num_cpus: int | None):
    global _RAY_OWNED
    import ray

    if not ray.is_initialized():
        ray.init(**_ray_init_kwargs(os.environ.get("RAY_ADDRESS", "local"), num_cpus))
        _RAY_OWNED = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_kg(args) -> int:
    import pyarrow.parquet as pq

    from . import testgen
    from .pipelines import kg

    _init_ray(args.num_cpus)
    if args.pages:
        pages = args.pages
    else:
        pages = testgen.pages_path_for(args.sf_dir, replicate=args.replicate)
    if args.mrconso:
        mrconso = pq.read_table(args.mrconso)
        mrsty = pq.read_table(args.mrsty)
    else:
        mrconso, mrsty = testgen.umls_tables()
    ds = kg.build_kg(pages, mrconso, mrsty, out_dir=args.out, num_parts=args.num_parts)
    print(json.dumps({"triples": ds.count(), "out": args.out}))
    return 0


def _load_triples(path: str):
    """Parquet OR any RDF text format the reference loads (.ttl/.owl/.rdf/
    .nt, gzip/bz2) → 4-column ontology-triples arrow table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if path.endswith((".parquet", ".pq")):
        return pq.read_table(path)
    from .sources.rdf import read_rdf

    df = read_rdf(path).to_pandas()
    return pa.Table.from_pandas(
        df[["subj", "pred", "obj", "obj_lang"]], preserve_index=False
    )


def cmd_enrich(args) -> int:
    import pyarrow.parquet as pq

    from . import testgen
    from .pipelines.enrichment import EnrichConfig, enrich_ontology
    from .sources.rdf import write_ntriples

    _init_ray(args.num_cpus)
    if args.source:
        src = _load_triples(args.source)
        mappings = pq.read_table(args.mappings) if args.mappings else testgen.ontology_fixture()["mappings"].slice(0, 0)
        target = _load_triples(args.target) if args.target else testgen.ontology_fixture()["target_triples"].slice(0, 0)
    else:
        fx = testgen.ontology_fixture()
        src, mappings, target = fx["source_triples"], fx["mappings"], fx["target_triples"]
    if args.mrconso:
        mrconso, mrsty = pq.read_table(args.mrconso), pq.read_table(args.mrsty)
    else:
        mrconso, mrsty = testgen.umls_tables()
    cfg = EnrichConfig(
        disambiguate=args.dc, match_missing=args.mc,
        code_to_pref_label=args.cpl, add_change_note=args.hn,
        language=args.l,
    )
    triples, unmatched = enrich_ontology(src, mrconso, mrsty, mappings, target, cfg)
    if args.out:
        if args.format == "nt":
            write_ntriples(triples, args.out)
        else:
            triples.write_parquet(args.out)
        unmatched.write_parquet(args.out + "_unmatched")
        print(json.dumps({"triples": triples.count(), "out": args.out}))
    else:
        print(json.dumps({"triples": triples.count(), "unmatched": unmatched.count()}))
    return 0


def cmd_generate(args) -> int:
    from .pipelines.generation import GenerationConfig, generate_skos

    _init_ray(args.num_cpus)
    cfg = GenerationConfig(
        use_dictionary=args.d is not None, use_corpus_raw=args.cr,
        use_corpus_std=args.cs, adapted=args.a, most_frequent_code=args.mfc,
    )
    cfg.validate()
    ds = generate_skos(args.d, args.corpus, args.chapters, cfg)
    if args.out:
        ds.write_parquet(args.out)
    print(json.dumps({"triples": ds.count(), "out": args.out}))
    return 0


def cmd_clean(args) -> int:
    from .pipelines.cleaner import clean_multilingual, repair_missing_pref_labels

    _init_ray(args.num_cpus)
    if args.input.endswith((".parquet", ".pq")):
        from .sources import parquet_io as pio

        ds = pio.read_parquet(args.input)
    else:  # RDF text formats, like the reference's cleaner input
        from .state.grouped import dataset_from_table

        ds = dataset_from_table(_load_triples(args.input))
    out = repair_missing_pref_labels(clean_multilingual(ds, args.l))
    if args.out:
        out.write_parquet(args.out)
    print(json.dumps({"triples": out.count(), "out": args.out}))
    return 0


def cmd_reconcile(args) -> int:
    import pyarrow.parquet as pq

    from . import testgen
    from .pipelines.reconciler import reconcile

    if args.source and not args.target:
        raise ValueError("--target is required when --source is given")
    if args.mrconso and not args.mrsty:
        raise ValueError("--mrsty is required when --mrconso is given")
    _init_ray(args.num_cpus)
    if args.source:
        src = _load_triples(args.source)
        tgt = _load_triples(args.target)
        mappings = pq.read_table(args.mappings) if args.mappings else testgen.ontology_fixture()["mappings"].slice(0, 0)
    else:
        fx = testgen.ontology_fixture()
        src, tgt, mappings = fx["source_triples"], fx["target_triples"], fx["mappings"]
    if args.mrconso:
        mrconso, mrsty = pq.read_table(args.mrconso), pq.read_table(args.mrsty)
    else:
        mrconso, mrsty = testgen.umls_tables()
    counts = reconcile(src, tgt, mrconso, mrsty, mappings)
    print(json.dumps(counts, sort_keys=True))
    return 0


def cmd_curate(args) -> int:
    from .pipelines import curation

    _init_ray(args.num_cpus)
    langs = tuple(x.strip() for x in args.langs.split(",") if x.strip())
    if not langs:
        raise ValueError("--langs must name at least one language")
    if not (0.0 <= args.min_quality <= 1.0):
        raise ValueError("--min-quality must be in [0, 1]")
    if not (0.0 < args.jaccard <= 1.0):
        raise ValueError("--jaccard must be in (0, 1]")
    ds, report = curation.curate(
        args.sf_dir,
        keep_langs=langs,
        min_quality=args.min_quality,
        jaccard_threshold=args.jaccard,
        out_dir=args.out,
        num_parts=args.num_parts,
    )
    # n_curated already counts the kept rows — ds.count() here would
    # re-execute the whole curation DAG a second time
    del ds
    print(json.dumps(report))
    return 0


def cmd_index(args) -> int:
    """Build the cell-partitioned IVF index (the one-time job of the
    100 TB ANN path): out/ must be on cluster-shared storage; queries
    then read only the probed cell partitions."""
    from .pipelines import ann

    _init_ray(args.num_cpus)
    if args.n_centroids < 1:
        raise ValueError("--n-centroids must be >= 1")
    out = ann.ivf_build_index(
        args.sf_dir, args.out, n_centroids=args.n_centroids, seed=args.seed
    )
    import os as _os

    cells = sorted(
        int(d.split("=", 1)[1])
        for d in _os.listdir(_os.path.join(out, "data"))
        if d.startswith("cell=")
    )
    print(json.dumps({"out": out, "n_cells": len(cells),
                      "n_centroids": args.n_centroids}))
    return 0


# Reference ``config.*`` property keys → this CLI's argparse dests
# (≙ CUIProcessorCommandlineHandler.java:109-147 and the generator/matcher
# handlers: every reference main() loads a .properties file FIRST, then
# command-line flags override individual keys — same precedence here).
_PROPERTY_DESTS = {
    "source_endpoint": "source",
    "target_endpoint": "target",
    "mappings_endpoint": "mappings",
    "disambiguate": "dc",
    "match": "mc",
    "add_code_to_preflabel": "cpl",
    "history_note": "hn",
    "language": "l",
    "dictionary": "d",
    "dictionary_path": "d",
    "corpus_path": "corpus",
    "corpus.raw": "cr",
    "corpus.std": "cs",
    "corpus.adapted": "a",
    "most_frequent_code": "mfc",
}
# live-service keys the engine designed away (broadcast tables replace
# Redis/MySQL, SURVEY §1.2) — present in every reference properties file,
# silently irrelevant here
_PROPERTY_IGNORED_PREFIXES = ("redis_", "umls_", "output_file_suffix")


def _load_properties(path: str) -> dict:
    """Java-.properties → {argparse dest: typed value}. Keys may be
    reference ``config.*`` names (mapped via _PROPERTY_DESTS) or this
    CLI's own dest names (dashes/dots → underscores). Values: true/false
    → bool, numeric strings → int/float, else verbatim."""
    out: dict = {}
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith(("#", "!")) or "=" not in line:
                continue
            key, val = (t.strip() for t in line.split("=", 1))
            if key.startswith("config."):
                key = key[len("config.") :]
            if any(key.startswith(pfx) for pfx in _PROPERTY_IGNORED_PREFIXES):
                continue
            dest = _PROPERTY_DESTS.get(key, key.replace("-", "_").replace(".", "_"))
            if val.lower() in ("true", "false"):
                out[dest] = val.lower() == "true"
                continue
            for cast in (int, float):
                try:
                    out[dest] = cast(val)
                    break
                except ValueError:
                    pass
            else:
                out[dest] = val
    return out


def build_parser(defaults: dict | None = None) -> argparse.ArgumentParser:
    """``defaults`` (from a -p .properties file) are applied via
    set_defaults on the top parser AND every subparser — subparsers parse
    into a fresh namespace (argparse SubParsersAction), so preloading the
    caller's namespace would be clobbered by subparser defaults; flags
    given explicitly still override."""
    p = argparse.ArgumentParser(prog="sifr_project_java_ontology_processing_ray")
    # shared options accepted before OR after the subcommand
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    common.add_argument(
        "-p", "--config", default=None, metavar="FILE",
        help=".properties defaults (flags override; reference config.* "
             "keys and plain dest names both accepted)",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("-p", "--config", default=None, metavar="FILE",
                   help=".properties defaults (flags override)")
    sub = p.add_subparsers(dest="cmd", required=True)

    k = sub.add_parser("kg", parents=[common], help="flagship pages→triples pipeline")
    k.add_argument("--pages", help="pages parquet path (default: derive from sf-dir)")
    k.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    k.add_argument("--replicate", type=int, default=1)
    k.add_argument("--mrconso"); k.add_argument("--mrsty")
    k.add_argument("--out", default=None)
    k.add_argument("--num-parts", type=int, default=16)
    k.set_defaults(fn=cmd_kg)

    e = sub.add_parser("enrich", parents=[common], help="ontology CUI/TUI enrichment cascade")
    e.add_argument("--source"); e.add_argument("--mappings"); e.add_argument("--target")
    e.add_argument("--mrconso"); e.add_argument("--mrsty")
    e.add_argument("-dc", action="store_true", help="disambiguate ambiguous CUIs")
    e.add_argument("-mc", action="store_true", help="match missing via similarity")
    e.add_argument("-cpl", action="store_true", help="code → prefLabel rewrite")
    e.add_argument("-hn", action="store_true", default=True, help="add history note")
    e.add_argument("-l", default="ENG", help="UMLS language code")
    e.add_argument("--out", default=None)
    e.add_argument("--format", choices=["parquet", "nt"], default="parquet")
    e.set_defaults(fn=cmd_enrich)

    g = sub.add_parser("generate", parents=[common], help="SKOS generation from dictionary/corpus")
    g.add_argument("-d", help="dictionary CSV path")
    g.add_argument("-cr", action="store_true", help="use corpus raw labels")
    g.add_argument("-cs", action="store_true", help="use corpus std labels")
    g.add_argument("-a", action="store_true", help="adapted mode")
    g.add_argument("-mfc", action="store_true", help="most-frequent-code mode")
    g.add_argument("--corpus"); g.add_argument("--chapters")
    g.add_argument("--out", default=None)
    g.set_defaults(fn=cmd_generate)

    c = sub.add_parser("clean", parents=[common], help="multilingual cleaning + label repair")
    c.add_argument("--input", required=True, help="triples parquet")
    c.add_argument("-l", default="en", help="target language")
    c.add_argument("--out", default=None)
    c.set_defaults(fn=cmd_clean)

    r = sub.add_parser("reconcile", parents=[common],
                       help="two-model CUI reconciliation stats (4th CLI)")
    r.add_argument("--source"); r.add_argument("--target"); r.add_argument("--mappings")
    r.add_argument("--mrconso"); r.add_argument("--mrsty")
    r.set_defaults(fn=cmd_reconcile)

    cu = sub.add_parser("curate", parents=[common],
                        help="corpus curation: lang/quality gate + exact & near dedup")
    cu.add_argument("--sf-dir", dest="sf_dir", required=True,
                    help="directory holding documents.parquet")
    cu.add_argument("--langs", default="en", help="comma-separated keep languages")
    cu.add_argument("--min-quality", dest="min_quality", type=float, default=0.3)
    cu.add_argument("--jaccard", type=float, default=0.6,
                    help="near-dup verification threshold")
    cu.add_argument("--out", default=None, help="partitioned parquet output dir")
    cu.add_argument("--num-parts", dest="num_parts", type=int, default=16)
    cu.set_defaults(fn=cmd_curate)

    ix = sub.add_parser("index", parents=[common],
                        help="build the cell-partitioned IVF ANN index")
    ix.add_argument("--sf-dir", dest="sf_dir", required=True,
                    help="directory holding embeddings.parquet")
    ix.add_argument("--out", required=True,
                    help="index output dir (cluster-shared storage)")
    ix.add_argument("--n-centroids", dest="n_centroids", type=int, default=16)
    ix.add_argument("--seed", type=int, default=42)
    ix.set_defaults(fn=cmd_index)
    if defaults:
        safe = {k: v for k, v in defaults.items() if k not in ("fn", "cmd")}
        for sp in (p, k, e, g, c, r, cu, ix):
            sp.set_defaults(**safe)
    return p


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # properties file loads FIRST as parser defaults; explicit flags
    # always overwrite — exactly the reference's load-then-override order
    props: dict = {}
    for flag in ("-p", "--config"):
        while flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                print(f"error: {flag} requires a file argument", file=sys.stderr)
                return 2
            try:
                props.update(_load_properties(argv[i + 1]))
            except OSError as e:
                print(f"error: cannot read config {argv[i + 1]!r}: {e}", file=sys.stderr)
                return 2
            del argv[i : i + 2]
    args = build_parser(props).parse_args(argv)
    try:
        return args.fn(args)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    finally:
        import ray

        if _RAY_OWNED and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
