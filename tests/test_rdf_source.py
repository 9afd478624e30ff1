"""N-Triples source/sink round-trip tests (S1/S2)."""

import glob
import gzip

from sifr_project_java_ontology_processing_ray.sources.rdf import (
    parse_ntriples_line,
    read_ntriples,
    triples_to_ntriples,
    write_ntriples,
)

NT = """# comment
<http://x/e1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2004/02/skos/core#Concept> .
<http://x/e1> <http://www.w3.org/2004/02/skos/core#prefLabel> "fi\\u00e8vre"@fr .
<http://x/e1> <http://bioportal.bioontology.org/ontologies/umls/cui> "C0000001"^^<http://www.w3.org/2001/XMLSchema#string> .
not a triple line
"""


def test_parse_line_forms():
    uri = parse_ntriples_line('<http://a> <http://b> <http://c> .')
    assert uri == ("http://a", "http://b", "http://c", None, False)
    lit = parse_ntriples_line('<http://a> <http://b> "hello"@en .')
    assert lit == ("http://a", "http://b", "hello", "en", True)
    typed = parse_ntriples_line('<http://a> <http://b> "X"^^<http://t> .')
    assert typed == ("http://a", "http://b", "X", None, True)
    assert parse_ntriples_line("garbage") is None


def test_read_ntriples_curie_contraction(ray_session, tmp_path):
    p = tmp_path / "f.nt"
    p.write_text(NT)
    df = read_ntriples(str(p)).to_pandas()
    assert len(df) == 3  # comment + garbage skipped
    assert set(df["pred"]) == {"rdf:type", "skos:prefLabel", "umls:cui"}
    row = df[df.pred == "skos:prefLabel"].iloc[0]
    assert row["obj"] == "fièvre" and row["obj_lang"] == "fr"


def test_read_gzip(ray_session, tmp_path):
    p = tmp_path / "f.nt.gz"
    with gzip.open(p, "wt") as f:
        f.write('<http://a> <http://b> "v" .\n')
    assert read_ntriples(str(p)).count() == 1


def test_roundtrip(ray_session, tmp_path):
    src = tmp_path / "src.nt"
    src.write_text(NT)
    ds = read_ntriples(str(src))
    out = tmp_path / "out"
    write_ntriples(ds, str(out))
    files = glob.glob(str(out / "*.nt"))
    assert files
    ds2 = read_ntriples(files)
    a = ds.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = ds2.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    assert a[["subj", "pred", "obj", "obj_lang"]].equals(b[["subj", "pred", "obj", "obj_lang"]])
