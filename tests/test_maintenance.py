"""Maintenance/resilience sources: small-file compaction and the
dead-letter JSONL reader."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sifr_project_java_ontology_processing_ray.sources.jsonl_dl import _parse_lines, read_jsonl_resilient
from sifr_project_java_ontology_processing_ray.sources.parquet_io import compact_parquet


class TestCompaction:
    def _write_shards(self, d, n_shards=24, rows_per=50):
        os.makedirs(d, exist_ok=True)
        k = 0
        for s in range(n_shards):
            t = pa.table(
                {"i": list(range(k, k + rows_per)),
                 "s": [f"row{j}" for j in range(k, k + rows_per)]}
            )
            pq.write_table(t, os.path.join(d, f"in-{s:04d}.parquet"))
            k += rows_per
        return n_shards * rows_per

    def test_compact_preserves_rows(self, ray_session, tmp_path):
        src = str(tmp_path / "many")
        out = str(tmp_path / "compact")
        total = self._write_shards(src)
        manifest = compact_parquet(src, out, target_files=4)
        assert manifest["rows"] == total
        files = sorted(glob.glob(os.path.join(out, "*.parquet")))
        assert 0 < len(files) <= 4 + 1  # repartition may leave ≤ target blocks
        got = pq.read_table(files).to_pandas().sort_values("i")
        assert got["i"].tolist() == list(range(total))
        with open(os.path.join(out, "_manifest.json")) as f:
            assert json.load(f) == manifest
        assert sorted(os.path.basename(p) for p in files) == manifest["shards"]

    def test_compact_idempotent_names(self, ray_session, tmp_path):
        src = str(tmp_path / "many2")
        self._write_shards(src, n_shards=4, rows_per=10)
        m1 = compact_parquet(src, str(tmp_path / "o1"), target_files=1)
        m2 = compact_parquet(src, str(tmp_path / "o2"), target_files=1)
        assert m1["shards"] == m2["shards"]  # content-hash: retry-stable


GOOD = [json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en"}) for i in range(200)]


class TestDeadletterJsonl:
    def test_bisect_isolates_bad_lines(self):
        lines = GOOD[:7] + ['{"broken']
        t, bad = _parse_lines(lines)
        assert bad == ['{"broken']
        assert t.num_rows == 7
        # several bad lines scattered
        lines = GOOD[:3] + ["nope"] + GOOD[3:6] + ['{"x":'] + GOOD[6:9]
        t, bad = _parse_lines(lines)
        assert sorted(bad) == ["nope", '{"x":']
        assert t.num_rows == 9

    def test_all_bad(self):
        t, bad = _parse_lines(["a", "b"])
        assert t is None and bad == ["a", "b"]

    def test_read_counts_deadletters(self, ray_session, tmp_path):
        from sifr_project_java_ontology_processing_ray.state.counters import counter_channel
        import ray

        p = str(tmp_path / "corpus.jsonl")
        with open(p, "w") as f:
            for i, ln in enumerate(GOOD):
                f.write(ln + "\n")
                if i % 50 == 10:
                    f.write('{"truncated-line\n')
        name = "test_dl_jsonl"
        ds = read_jsonl_resilient(p, stats_name=name)
        df = ds.to_pandas()
        assert len(df) == len(GOOD)
        assert sorted(df["doc_id"].tolist()) == list(range(len(GOOD)))
        counts = ray.get(counter_channel(name).get.remote())
        assert counts.get("n_bad_lines") == 4
        # lazy re-execution must not double-count (idempotent channel)
        ds.to_pandas()
        counts = ray.get(counter_channel(name).get.remote())
        assert counts.get("n_bad_lines") == 4

    def test_clean_corpus_zero_actor_traffic(self, ray_session, tmp_path):
        p = str(tmp_path / "clean.jsonl")
        with open(p, "w") as f:
            f.write("\n".join(GOOD) + "\n")
        df = read_jsonl_resilient(p).to_pandas()
        assert len(df) == len(GOOD)


class TestCrossParallelismDeterminism:
    """The session-7 bucketed operators must be bit-identical at any
    bucket count (the engine-wide determinism contract: results never
    depend on physical partitioning)."""

    @pytest.mark.parametrize("buckets", [1, 7])
    def test_hour_window_sum(self, ray_session, sf_small, monkeypatch, buckets):
        from sifr_project_java_ontology_processing_ray.pipelines import analytics
        from sifr_project_java_ontology_processing_ray.state import grouped

        want = analytics.q_user_hour_window_sum(sf_small)
        monkeypatch.setattr(grouped, "DEFAULT_BUCKETS", buckets)
        got = analytics.q_user_hour_window_sum(sf_small)
        assert got.equals(want)

    @pytest.mark.parametrize("buckets", [1, 7])
    def test_fuzzy_name_pairs(self, ray_session, sf_small, monkeypatch, buckets):
        from sifr_project_java_ontology_processing_ray.pipelines import textops
        from sifr_project_java_ontology_processing_ray.state import grouped

        want = textops.q_fuzzy_name_pairs(sf_small)
        monkeypatch.setattr(grouped, "DEFAULT_BUCKETS", buckets)
        got = textops.q_fuzzy_name_pairs(sf_small)
        assert got.equals(want)

    @pytest.mark.parametrize("blocks", [1, 13])
    def test_value_mad_block_layout(self, ray_session, sf_small, blocks):
        # histogram partials: any read block layout → same exact MAD
        from sifr_project_java_ontology_processing_ray.pipelines import analytics
        from sifr_project_java_ontology_processing_ray.sources import parquet_io

        want = analytics.q_value_mad(sf_small)
        orig = parquet_io.read_parquet

        def forced(paths, **kw):
            kw["override_num_blocks"] = blocks
            return orig(paths, **kw)

        try:
            parquet_io.read_parquet = forced
            # relational._read resolves pio.read_parquet at call time
            got = analytics.q_value_mad(sf_small)
        finally:
            parquet_io.read_parquet = orig
        assert got.equals(want)

    @pytest.mark.parametrize("buckets", [1, 7])
    def test_global_rank(self, ray_session, sf_small, monkeypatch, buckets):
        from sifr_project_java_ontology_processing_ray.pipelines import relational
        from sifr_project_java_ontology_processing_ray.state import grouped

        want = relational.q_global_rank(sf_small)
        monkeypatch.setattr(grouped, "DEFAULT_BUCKETS", buckets)
        got = relational.q_global_rank(sf_small)
        assert got.equals(want)

    @pytest.mark.parametrize("buckets", [1, 7])
    def test_event_debounce(self, ray_session, sf_small, monkeypatch, buckets):
        from sifr_project_java_ontology_processing_ray.pipelines import analytics
        from sifr_project_java_ontology_processing_ray.state import grouped

        want = analytics.q_event_debounce(sf_small)
        monkeypatch.setattr(grouped, "DEFAULT_BUCKETS", buckets)
        got = analytics.q_event_debounce(sf_small)
        assert got.equals(want)


class TestPoolSize:
    """The session-8 small-cluster rule: a fixed 1-cpu pool must never
    reserve every core (streaming-executor hang repro'd at 2 cpus)."""

    def test_never_reserves_every_core(self):
        from sifr_project_java_ontology_processing_ray.state.partitions import pool_size

        for ncpu in range(2, 64):
            n = pool_size(ncpu)
            assert 1 <= n, ncpu
            if ncpu > 1:
                assert n < ncpu, f"pool of {n} reserves all {ncpu} cores"
        # ncpu == 1 is BELOW the engine floor: it must FAIL FAST, not
        # return a size that silently hangs the executor (ADVICE r4)
        with pytest.raises(ValueError):
            pool_size(1)

    def test_matches_flagship_sizing(self):
        from sifr_project_java_ontology_processing_ray.state.partitions import pool_size

        assert pool_size(32) == 28
        assert pool_size(8) == 4
        assert pool_size(6) == 2
        assert pool_size(4) == 3
        assert pool_size(2) == 1


class TestPartialMergeLayoutInvariance:
    """Session-8 operators built on per-block partial-merge shapes
    (local top-k, local fronts, per-label vector sums) must be
    bit-identical at any read block layout."""

    @pytest.fixture()
    def forced_blocks(self):
        from sifr_project_java_ontology_processing_ray.sources import parquet_io

        orig = parquet_io.read_parquet

        def force(n):
            def forced(paths, **kw):
                kw["override_num_blocks"] = n
                return orig(paths, **kw)

            parquet_io.read_parquet = forced

        yield force
        parquet_io.read_parquet = orig

    @pytest.mark.parametrize("blocks", [1, 13])
    def test_weighted_sample(self, ray_session, sf_small, forced_blocks, blocks):
        from sifr_project_java_ontology_processing_ray.pipelines import textops

        want = textops.q_weighted_sample(sf_small)
        forced_blocks(blocks)
        assert textops.q_weighted_sample(sf_small).equals(want)

    @pytest.mark.parametrize("blocks", [1, 13])
    def test_pareto_orders(self, ray_session, sf_small, forced_blocks, blocks):
        from sifr_project_java_ontology_processing_ray.pipelines import relational

        want = relational.q_pareto_orders(sf_small)
        forced_blocks(blocks)
        assert relational.q_pareto_orders(sf_small).equals(want)

    @pytest.mark.parametrize("blocks", [1, 13])
    def test_label_centroids(self, ray_session, sf_small, forced_blocks, blocks):
        from sifr_project_java_ontology_processing_ray.pipelines import ann

        want = ann.q_label_centroids(sf_small)
        forced_blocks(blocks)
        got = ann.q_label_centroids(sf_small)
        # float sums reorder across layouts; the ROUNDED output contract
        # (6 dp, ~1e-13 noise floor) is what must hold
        import pandas.testing as pdt

        pdt.assert_frame_equal(got, want)

    @pytest.mark.parametrize("blocks", [1, 13])
    def test_rrf_fusion(self, ray_session, sf_small, forced_blocks, blocks):
        from sifr_project_java_ontology_processing_ray.pipelines import ann

        want = ann.q_rrf_fusion(sf_small)
        forced_blocks(blocks)
        assert ann.q_rrf_fusion(sf_small).equals(want)
