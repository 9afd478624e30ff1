"""CLI surface tests (§2.10): subcommand wiring + flag validation through
the real argparse path (Ray session shared via the suite fixture — the CLI
only calls ray.init when not already initialized)."""

import json


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
