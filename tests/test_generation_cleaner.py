"""Tests for the SKOS generator, the multilingual cleaner, the CSV/XML
sources, and the multimodal plumbing."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sifr_project_java_ontology_processing_ray.pipelines.cleaner import (
    clean_multilingual,
    repair_missing_pref_labels,
)
from sifr_project_java_ontology_processing_ray.pipelines.generation import (
    GenerationConfig,
    generate_skos,
)


@pytest.fixture(scope="module")
def gen_paths(fixtures_dir):
    return {
        "dict": os.path.join(fixtures_dir, "ehealth_dictionary.csv"),
        "corpus": os.path.join(fixtures_dir, "ehealth_corpus.csv"),
        "chapters": os.path.join(fixtures_dir, "chapter_ranges.csv"),
    }


class TestGeneration:
    def test_plain_mode(self, ray_session, gen_paths):
        ds = generate_skos(gen_paths["dict"], None, gen_paths["chapters"])
        df = ds.to_pandas()
        concepts = df[(df.pred == "rdf:type") & (df.obj == "skos:Concept")]
        assert len(concepts) > 4  # codes + chapter skeleton
        # normalized codes: A0112 -> A01.12 appears as a notation
        notations = set(df[df.pred == "skos:notation"]["obj"])
        assert "A01.12" in notations
        # every concept has exactly one prefLabel
        pref = df[df.pred == "skos:prefLabel"]
        assert pref.groupby("subj").size().max() == 1
        # chapters assigned by range join
        broader = df[df.pred == "skos:broader"]
        assert broader["obj"].str.startswith("http://chapter.example/").all()

    def test_pref_label_rule(self, ray_session, gen_paths):
        ds = generate_skos(gen_paths["dict"], None, gen_paths["chapters"])
        df = ds.to_pandas()
        # code B20 has labels "GRIPPE SAISONNIERE" (all caps → ratio ≥ .25)
        # and "grippe" → prefLabel must be "grippe"
        uri = "http://sifr-ray.example/skos/concept/B20"
        pref = df[(df.subj == uri) & (df.pred == "skos:prefLabel")]["obj"].tolist()
        assert pref == ["grippe"]

    def test_mfc_mode(self, ray_session, gen_paths):
        cfg = GenerationConfig(use_dictionary=False, use_corpus_raw=True,
                               use_corpus_std=True, most_frequent_code=True)
        ds = generate_skos(None, gen_paths["corpus"], gen_paths["chapters"], cfg)
        df = ds.to_pandas()
        assert (df.pred == "skos:prefLabel").sum() > 0

    def test_adapted_mode(self, ray_session, gen_paths):
        cfg = GenerationConfig(use_dictionary=False, use_corpus_raw=True,
                               use_corpus_std=True, adapted=True)
        ds = generate_skos(None, gen_paths["corpus"], gen_paths["chapters"], cfg)
        assert ds.count() > 0

    def test_flag_validation(self):
        with pytest.raises(ValueError):
            GenerationConfig(adapted=True, most_frequent_code=True).validate()
        with pytest.raises(ValueError):
            GenerationConfig(adapted=True, use_corpus_raw=False).validate()

    def test_deterministic(self, ray_session, gen_paths):
        def run():
            return (
                generate_skos(gen_paths["dict"], gen_paths["corpus"],
                              gen_paths["chapters"],
                              GenerationConfig(use_corpus_raw=True, use_corpus_std=True))
                .to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(run(), run())


def _triples_ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
                "obj_lang": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


class TestCleaner:
    def test_clean_multilingual_keeps_target(self, ray_session):
        e = "http://x/e1"
        ds = _triples_ds(
            [
                (e, "skos:prefLabel", "lung", "en"),
                (e, "skos:prefLabel", "poumon", "fr"),
                (e, "skos:prefLabel", "untagged", None),
                (e, "rdf:type", "skos:Concept", None),
            ]
        )
        out = clean_multilingual(ds, "en").to_pandas()
        labels = out[out.pred == "skos:prefLabel"]
        assert set(labels["obj"]) == {"lung", "untagged"}  # fr dropped
        assert (out.pred == "rdf:type").sum() == 1  # non-label preds untouched

    def test_clean_multilingual_keeps_foreign_when_target_absent(self, ray_session):
        e = "http://x/e2"
        ds = _triples_ds([(e, "skos:altLabel", "poumon", "fr")])
        out = clean_multilingual(ds, "en").to_pandas()
        assert len(out) == 1  # fr kept: no en literal exists

    def test_clean_multilingual_covers_all_properties(self, ray_session):
        """M16 fidelity: the reference iterates EVERY property
        (OWLOntologyCleaner.java:169-247), not a label allowlist — a
        non-SKOS literal predicate in two languages keeps only the
        target; resource-object triples are untouched."""
        e = "http://x/e3"
        ds = _triples_ds(
            [
                (e, "dc:description", "a lung disease", "en"),
                (e, "dc:description", "une maladie pulmonaire", "fr"),
                (e, "ex:relatedTo", "http://x/other", None),
            ]
        )
        out = clean_multilingual(ds, "en").to_pandas()
        desc = out[out.pred == "dc:description"]
        assert set(desc["obj"]) == {"a lung disease"}
        assert (out.pred == "ex:relatedTo").sum() == 1

    def test_repair_pref_labels(self, ray_session):
        e1, e2, e3 = "http://x/a", "http://x/b", "http://x/c"
        ds = _triples_ds(
            [
                (e1, "skos:prefLabel", "fine", None),
                (e2, "skos:altLabel", "alt label", None),
                (e3, "skos:hiddenLabel", "hiddenCamelCase", None),
            ]
        )
        out = repair_missing_pref_labels(ds).to_pandas()
        pref = dict(
            out[out.pred == "skos:prefLabel"][["subj", "obj"]].itertuples(index=False)
        )
        assert pref[e1] == "fine"
        assert pref[e2] == "alt label"  # altLabel promoted (M17)
        assert pref[e3] == "hidden camel case"  # camelCase split + lowercase


class TestXMLSource:
    def test_ncbo_roundtrip(self, ray_session, tmp_path):
        from sifr_project_java_ontology_processing_ray.sources.xml_source import read_ncbo_sparql

        xml = """<?xml version="1.0"?>
<sparql xmlns="http://www.w3.org/2005/sparql-results#">
 <results>
  <result><binding name="s"><uri>http://x/c1</uri></binding>
          <binding name="o"><literal>C0000001</literal></binding></result>
  <result><binding name="s"><uri>http://x/c2</uri></binding>
          <binding name="o"><literal>C0000002</literal></binding></result>
 </results>
</sparql>"""
        p = tmp_path / "cui.xml"
        p.write_text(xml)
        df = read_ncbo_sparql([(str(p), "umls:cui")]).to_pandas()
        assert len(df) == 2
        assert set(df["obj"]) == {"C0000001", "C0000002"}
        assert (df["pred"] == "umls:cui").all()


class TestMultimodal:
    def test_fake_decode_plumbing(self, ray_session):
        from sifr_project_java_ontology_processing_ray.stages.multimodal import (
            FakeImageDecoder,
            make_media_table,
            resize_metadata,
        )

        media = make_media_table(50)
        ds = rd.from_arrow(media).map_batches(
            FakeImageDecoder, batch_format="pyarrow", batch_size=16,
            concurrency=2, num_cpus=0.5,
        ).map_batches(resize_metadata, batch_format="pyarrow")
        df = ds.to_pandas()
        assert len(df) == 50
        assert "payload" not in df.columns  # binary dropped early
        assert (df["decoded_w"] == df["width"]).all()
        assert (df["resized_w"] <= 64).all() and (df["resized_h"] <= 64).all()
        assert df["features"].map(len).eq(8).all()

    def test_real_decoder_gated(self):
        from sifr_project_java_ontology_processing_ray.stages.multimodal import RealImageDecoder

        with pytest.raises(NotImplementedError):
            RealImageDecoder()

    def test_frame_sampler_plumbing(self, ray_session):
        from sifr_project_java_ontology_processing_ray.stages.multimodal import (
            FakeFrameSampler,
            make_video_table,
        )

        videos = make_video_table(60)
        ds = rd.from_arrow(videos).map_batches(
            FakeFrameSampler, batch_format="pyarrow", batch_size=16,
            concurrency=2, num_cpus=0.5,
        )
        df = ds.to_pandas()
        meta = videos.to_pandas().set_index("media_id")
        # per-video: ≤8 frames, uniformly strided, capped by clip length
        for mid, g in df.groupby("media_id"):
            nf = int(meta.loc[mid, "n_frames"])
            fps = int(meta.loc[mid, "fps"])
            stride = max(1, nf // 8)
            want = list(range(0, nf, stride))[:8]
            assert sorted(g["frame_idx"]) == want
            assert all(abs(t - round(i / fps, 3)) < 1e-12
                       for i, t in zip(g["frame_idx"], g["ts_s"]))
        assert set(df["media_id"]) == set(meta.index)  # no clip dropped

    def test_audio_decoder_plumbing(self, ray_session):
        from sifr_project_java_ontology_processing_ray.stages.multimodal import (
            FakeAudioDecoder,
            make_audio_table,
        )

        audio = make_audio_table(40)
        df = rd.from_arrow(audio).map_batches(
            FakeAudioDecoder, batch_format="pyarrow", batch_size=16,
            concurrency=2, num_cpus=0.5,
        ).to_pandas()
        assert len(df) == 40
        assert "payload" not in df.columns
        ns = df["n_samples"].astype("int64")  # int32 fixture col would overflow ×16000
        assert (df["duration_ms"] == 1000 * ns // df["sample_rate"]).all()
        assert (df["resampled_n"] == ns * 16000 // df["sample_rate"]).all()
        # a 16 kHz clip resamples to itself
        native = df[df["sample_rate"] == 16000]
        assert (native["resampled_n"] == native["n_samples"]).all()

    def test_frame_sampler_edge_lengths(self):
        from sifr_project_java_ontology_processing_ray.stages.multimodal import (
            FakeFrameSampler,
            encode_fake_video,
        )
        import pyarrow as pa

        s = FakeFrameSampler()
        for nf, want in ((1, [0]), (7, list(range(7))), (8, list(range(8))),
                         (9, [0, 1, 2, 3, 4, 5, 6, 7]), (17, [0, 2, 4, 6, 8, 10, 12, 14])):
            batch = pa.table({"media_id": pa.array([0], pa.int64()),
                              "payload": pa.array([encode_fake_video(0, nf, 25)], pa.binary())})
            out = s(batch)
            assert out["frame_idx"].to_pylist() == want, nf
