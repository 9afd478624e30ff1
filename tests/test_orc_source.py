"""ORC source/sink: stripe-fan-out read, content-hash sharded write,
manifest contract, column pruning."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sifr_project_java_ontology_processing_ray.sources.orc_io import read_orc, write_orc


@pytest.fixture()
def docs_table(sf_small):
    return pq.read_table(os.path.join(sf_small, "documents.parquet"))


class TestORC:
    def test_roundtrip(self, ray_session, sf_small, docs_table, tmp_path):
        import ray.data as rd

        ds = rd.read_parquet(os.path.join(sf_small, "documents.parquet"))
        out = str(tmp_path / "docs_orc")
        manifest = write_orc(ds, out)
        assert manifest["rows"] == docs_table.num_rows
        assert os.path.exists(os.path.join(out, "_manifest.json"))
        back = read_orc(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
        orig = (
            docs_table.to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd_cols = sorted(orig.columns)
        assert sorted(back.columns) == pd_cols
        for c in pd_cols:
            assert back[c].tolist() == orig[c].tolist()

    def test_multi_stripe_fanout(self, ray_session, tmp_path):
        # a file written with small stripes must list >1 read unit
        from pyarrow import orc

        t = pa.table({"i": list(range(50_000)), "s": ["x"] * 50_000})
        p = str(tmp_path / "multi.orc")
        orc.write_table(t, p, stripe_size=64 * 1024)
        f = orc.ORCFile(p)
        assert f.nstripes > 1
        got = read_orc(p).to_pandas()
        assert sorted(got["i"].tolist()) == list(range(50_000))

    def test_column_pruning(self, ray_session, sf_small, tmp_path):
        import ray.data as rd

        ds = rd.read_parquet(os.path.join(sf_small, "documents.parquet"))
        out = str(tmp_path / "docs_orc2")
        write_orc(ds, out)
        got = read_orc(out, columns=["doc_id"]).to_pandas()
        assert list(got.columns) == ["doc_id"]

    def test_write_idempotent_names(self, ray_session, tmp_path):
        # same content → same shard name: a retried write task cannot
        # duplicate rows
        import ray.data as rd

        t = pa.table({"a": [1, 2, 3]})
        d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        m1 = write_orc(rd.from_arrow(t), d1)
        m2 = write_orc(rd.from_arrow(t), d2)
        assert m1["shards"] == m2["shards"]
        with open(os.path.join(d1, "_manifest.json")) as f:
            assert json.load(f) == m1

    def test_missing_path_raises(self):
        with pytest.raises(FileNotFoundError):
            read_orc("/tmp/definitely_not_there_xyz.orc")
