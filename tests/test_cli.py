"""CLI surface tests (§2.10): subcommand wiring + flag validation through
the real argparse path (Ray session shared via the suite fixture — the CLI
only calls ray.init when not already initialized)."""

import json


def test_ray_init_kwargs_deployment_modes():
    """north rule: the CLI is the ray-job-submit entrypoint. local mode
    starts an in-process Ray with limits; a cluster $RAY_ADDRESS (what the
    job runtime exports) must CONNECT — no num_cpus/include_dashboard,
    which ray.init rejects when joining an existing cluster."""
    from sifr_project_java_ontology_processing_ray.__main__ import _ray_init_kwargs

    local = _ray_init_kwargs("local", 8)
    assert local["address"] == "local" and local["num_cpus"] == 8
    assert local["include_dashboard"] is False

    for addr in ("auto", "ray://head:10001", "10.0.0.1:6379"):
        cluster = _ray_init_kwargs(addr, 8)
        assert cluster["address"] == addr
        assert "num_cpus" not in cluster and "include_dashboard" not in cluster


def test_reconcile_cli(ray_session, capsys):
    from sifr_project_java_ontology_processing_ray.__main__ import main

    rc = main(["reconcile"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_source_classes"] > 0
    assert set(out) >= {"classes_with_cuis", "umls_codes_found"}


def test_generate_cli_flag_validation(ray_session, capsys):
    from sifr_project_java_ontology_processing_ray.__main__ import main

    # -a without -cr/-cs must fail validation (reference semantics)
    rc = main(["generate", "-a"])
    assert rc == 2


def test_clean_cli_accepts_turtle(ray_session, capsys, tmp_path):
    """The reference's cleaner takes an ontology FILE; so does ours —
    a .ttl input goes through read_rdf, gets cleaned, and writes parquet."""
    import json

    import pandas as pd

    from sifr_project_java_ontology_processing_ray.__main__ import main

    ttl = """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
<http://x/e1> skos:prefLabel "lung"@en , "poumon"@fr .
<http://x/e2> skos:altLabel "only alt" .
"""
    src = tmp_path / "onto.ttl"
    src.write_text(ttl)
    out = str(tmp_path / "cleaned")
    rc = main(["clean", "--input", str(src), "-l", "en", "--out", out])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["triples"] == 3
    df = pd.read_parquet(out)
    # fr label dropped (en present); e2 got a synthesized prefLabel
    assert set(df[df.subj == "http://x/e1"]["obj"]) == {"lung"}
    assert "only alt" in set(df[(df.subj == "http://x/e2") & (df.pred == "skos:prefLabel")]["obj"])


def test_curate_cli(ray_session, capsys, sf_small, tmp_path):
    """The curate subcommand runs the composed curation pipeline and
    prints the rejection report; with --out it writes the partitioned
    corpus and the report counts match the written rows."""
    import json

    import pandas as pd

    from sifr_project_java_ontology_processing_ray.__main__ import main

    out = str(tmp_path / "curated")
    rc = main([
        "curate", "--sf-dir", sf_small, "--langs", "en",
        "--min-quality", "0.3", "--out", out, "--num-parts", "2",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_docs"] > 0
    import glob

    shards = glob.glob(out + "/__part=*/*.parquet")
    assert shards, "no partition shards written"
    df = pd.concat([pd.read_parquet(p) for p in shards])
    assert len(df) == rep["n_curated"]
    # rejection counters are PER-REASON (a doc may trip several), so they
    # bound — not partition — the drop count; the lang gate runs on the
    # DETECTED language (curation._annotate), not the lang column
    dropped = rep["n_docs"] - rep["n_curated"]
    reasons = (
        rep["n_lang_rejected"]
        + rep["n_quality_rejected"]
        + rep["n_exact_dups_removed"]
        + rep["n_near_dups_removed"]
    )
    assert 0 <= dropped <= reasons


def test_curate_cli_validates_args(ray_session, capsys, sf_small):
    from sifr_project_java_ontology_processing_ray.__main__ import main

    assert main(["curate", "--sf-dir", sf_small, "--langs", " "]) == 2
    assert main(["curate", "--sf-dir", sf_small, "--min-quality", "7"]) == 2
    assert main(["curate", "--sf-dir", sf_small, "--jaccard", "0"]) == 2


def test_properties_file_defaults_then_flag_override(ray_session, capsys, tmp_path):
    """VERDICT r4 #7: a reference-style .properties file (-p) populates
    defaults before flags — reference config.* keys map to this CLI's
    options, flags override individual keys, and the dead live-service
    keys (redis/umls jdbc) are ignored."""
    from sifr_project_java_ontology_processing_ray.__main__ import _load_properties, main

    props = tmp_path / "cuiprocessor_config.properties"
    props.write_text(
        "# reference-style config\n"
        "config.redis_host=localhost\n"
        "config.redis_port=6379\n"
        "config.umls_jdbc=jdbc:mysql://127.0.0.1\n"
        "config.disambiguate=true\n"
        "config.language=FRE\n"
        "min_quality=0.45\n"
    )
    loaded = _load_properties(str(props))
    assert loaded == {"dc": True, "l": "FRE", "min_quality": 0.45}

    # end-to-end through main(): properties set -l FRE, flag overrides it
    rc = main(["-p", str(props), "reconcile"])
    assert rc == 0
    capsys.readouterr()

    # defaults plumbing: parse with and without an explicit override
    from sifr_project_java_ontology_processing_ray.__main__ import build_parser

    a1 = build_parser(loaded).parse_args(["enrich"])
    assert a1.dc is True and a1.l == "FRE"
    a2 = build_parser(loaded).parse_args(["enrich", "-l", "ENG"])
    assert a2.l == "ENG" and a2.dc is True


def test_index_cli_builds_partitioned_ivf(ray_session, capsys, sf_small, tmp_path):
    """The `index` subcommand is the one-time IVF build job: hive cell
    partitions + centroids land in --out, counts reported as JSON."""
    import json
    import os

    from sifr_project_java_ontology_processing_ray.__main__ import main

    out = str(tmp_path / "ivf")
    rc = main(["index", "--sf-dir", sf_small, "--out", out, "--n-centroids", "8"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["out"] == out and 1 <= rep["n_cells"] <= 8
    assert os.path.exists(os.path.join(out, "centroids.npy"))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
