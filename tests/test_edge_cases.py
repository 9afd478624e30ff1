"""Edge-case robustness: empty inputs, degenerate dictionaries, single-row
tables — the shapes a 100TB run will inevitably contain somewhere."""

import pyarrow as pa
import pytest
import ray.data as rd

from sifr_project_java_ontology_processing_ray import schema, testgen
from sifr_project_java_ontology_processing_ray.pipelines import kg
from sifr_project_java_ontology_processing_ray.pipelines.enrichment import enrich_ontology
from sifr_project_java_ontology_processing_ray.stages.link import MentionLinker, build_link_tables
from sifr_project_java_ontology_processing_ray.state.broadcast import Broadcast


def _pages_table(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([None] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=schema.PAGES,
    )


def test_kg_on_empty_pages(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "empty.parquet")
    pq.write_table(_pages_table([]), p)
    mrconso, mrsty = testgen.umls_tables()
    ds = kg.build_kg(p, mrconso, mrsty, concurrency=2)
    assert ds.count() == 0


def test_kg_pages_without_mentions(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rows = [
        ("http://a", b"<p>zzz qqq unknownwords only</p>", "", "en"),
        ("http://b", b"", "pre-populated totally unknown words", ""),
        # unextractable page: empty html AND empty text — page triples are
        # METADATA-derived, so rdf:type/dc:language are still emitted
        # (engine and sequential oracle agree on this, ADVICE r1)
        ("http://empty", b"", "", "fr"),
    ]
    p = str(tmp_path / "nomention.parquet")
    pq.write_table(_pages_table(rows), p)
    mrconso, mrsty = testgen.umls_tables()
    df = kg.build_kg(p, mrconso, mrsty, concurrency=2, pack_struct=False).to_pandas()
    # page triples still emitted; no mention/label/cooccur triples
    assert set(df["prov_rule"]) <= {"page", "umls"}
    assert (df.pred == "rdf:type").sum() == 3
    # untagged lang → no dc:language triple for page b
    assert set(df[df.pred == "dc:language"].subj) == {"http://a", "http://empty"}

    # engine must agree with the sequential oracle on empty-text pages
    from tools.kg_oracle import kg_oracle_triples, precision_recall

    want = kg_oracle_triples(p, mrconso, mrsty)
    got = set(zip(df["subj"], df["pred"], df["obj"]))
    assert precision_recall(got, want) == (1.0, 1.0)


def test_linker_on_empty_dictionary(ray_session):
    empty = pa.table(
        {"cui": pa.array([], pa.string()), "lat": pa.array([], pa.string()),
         "str": pa.array([], pa.string()), "code": pa.array([], pa.string())},
        schema=schema.MRCONSO,
    )
    tables_bc = Broadcast.put(build_link_tables(empty))
    pages = rd.from_arrow(
        pa.table({"url": ["u"], "warc_ts": pa.array([None], pa.timestamp("us")),
                  "text": ["some words here"], "lang": ["en"]})
    )
    out = pages.map_batches(
        MentionLinker, fn_constructor_args=(tables_bc,), batch_format="pyarrow",
        concurrency=1, num_cpus=0.5,
    ).to_pandas()
    assert len(out) == 0  # no dictionary → no mentions, no crash


def test_enrichment_on_empty_ontology(ray_session):
    empty = pa.table(
        {"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
         "obj": pa.array([], pa.string()), "obj_lang": pa.array([], pa.string())},
        schema=schema.ONTO_TRIPLES,
    )
    fx = testgen.ontology_fixture()
    mrconso, mrsty = testgen.umls_tables()
    triples, unmatched = enrich_ontology(
        empty, mrconso, mrsty, fx["mappings"].slice(0, 0), fx["target_triples"].slice(0, 0)
    )
    assert triples.count() == 0
    assert unmatched.count() == 0


def test_single_page_single_word(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rows = [("http://one", b"<p>spark</p>", "", "en")]
    p = str(tmp_path / "one.parquet")
    pq.write_table(_pages_table(rows), p)
    mrconso, mrsty = testgen.umls_tables()
    df = kg.build_kg(p, mrconso, mrsty, concurrency=2, pack_struct=False).to_pandas()
    # one mention, no cooccur possible
    assert (df.pred == "sifr:mentions").sum() == 1
    assert (df.pred == "sifr:cooccursWith").sum() == 0


def test_join_partitions_scales_with_cluster(ray_session):
    """VERDICT r3 #2 pin: no hint → one reduce task per cluster CPU
    (floored); a rows hint caps toy-scale joins at rows/100k but never
    below 2; a huge hint never exceeds the cluster-derived count."""
    import ray

    from sifr_project_java_ontology_processing_ray.state.partitions import (
        ROWS_PER_PARTITION,
        join_partitions,
    )

    ncpu = int(ray.cluster_resources().get("CPU", 0))
    cluster = max(8, ncpu)
    assert join_partitions() == cluster
    assert join_partitions(rows=1) == 2
    assert join_partitions(rows=3 * ROWS_PER_PARTITION) == min(cluster, 3)
    assert join_partitions(rows=10**12) == cluster


def test_fixture_fingerprint_tracks_generator_content(tmp_path, monkeypatch):
    """Editing a generator module must change the fixture marker name, so
    stale on-disk parquet can never be served to the SQL oracles."""
    from sifr_project_java_ontology_processing_ray import testgen

    fp1 = testgen._fixture_fingerprint()
    # a changed generator module source must produce a different digest
    import sifr_project_java_ontology_processing_ray.stages.multimodal as mm

    alt = tmp_path / "multimodal_edited.py"
    alt.write_bytes(open(mm.__file__, "rb").read() + b"\n# edited\n")
    monkeypatch.setattr(mm, "__file__", str(alt))
    assert testgen._fixture_fingerprint() != fp1


def test_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL is both a source AND a sink: write_json → read_json preserves
    rows and column values exactly (int64/string), including an empty
    text — the interchange contract q_jsonl_token_stats relies on."""
    import pyarrow as pa
    import ray.data as rd

    from sifr_project_java_ontology_processing_ray.state.grouped import dataset_from_table

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en", "fr", "en", "de"], pa.string()),
            "text": pa.array(["key agg row", "", "hash join fast", "a"], pa.string()),
        }
    )
    out = str(tmp_path / "jsonl_out")
    dataset_from_table(t, target_rows=2).write_json(out)
    back = rd.read_json(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == [1, 2, 3, 4]
    assert back["lang"].tolist() == ["en", "fr", "en", "de"]
    assert back["text"].tolist() == ["key agg row", "", "hash join fast", "a"]


def test_jsonl_corpus_deterministic():
    """The jsonl fixture generator is bit-deterministic (the oracle reads
    the files the engine reads — both must see identical bytes across
    processes and sessions)."""
    from sifr_project_java_ontology_processing_ray.testgen import make_jsonl_corpus

    a = make_jsonl_corpus()
    b = make_jsonl_corpus()
    assert a == b
    assert sum(len(s) for s in a) == 400
    assert any('"text": ""' in line for shard in a for line in shard)
