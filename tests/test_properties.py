"""Property-based tests (hypothesis) for the deterministic kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from sifr_project_java_ontology_processing_ray.functions import codes, hashing, text
from sifr_project_java_ontology_processing_ray.sources.rdf import (
    parse_ntriples_line,
    triples_to_ntriples,
)
from sifr_project_java_ontology_processing_ray.state.unionfind import UnionFind

# printable text without control chars; single-spaced words for round-trip
words = st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=10)
texts = st.lists(words, min_size=0, max_size=40).map(" ".join)


class TestExtractRoundtrip:
    @given(texts)
    @settings(max_examples=200, deadline=None)
    def test_html_roundtrip(self, t):
        assert text.extract_text(text.text_to_html(t, title="t")) == t

    @given(st.binary(max_size=2048))
    @settings(max_examples=200, deadline=None)
    def test_extract_total_on_arbitrary_bytes(self, b):
        out = text.extract_text(b)
        assert isinstance(out, str)
        assert text.extract_text(b) == out  # deterministic


class TestCodes:
    @given(st.text(max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_normalize_idempotent(self, s):
        assert codes.normalize_code(codes.normalize_code(s)) == codes.normalize_code(s)

    @given(st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_clean_xsd_idempotent(self, s):
        assert codes.clean_xsd_type(codes.clean_xsd_type(s)) == codes.clean_xsd_type(s)


class TestUnionFind:
    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_root_is_component_min(self, pairs):
        uf = UnionFind()
        for a, b in pairs:
            uf.union(f"n{a:02d}", f"n{b:02d}")
        comp = uf.components()
        # group members by root; every root must be its group's min
        groups = {}
        for node, root in comp.items():
            groups.setdefault(root, []).append(node)
        for root, members in groups.items():
            assert root == min(members + [root])

    @given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)), max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_order_invariant(self, pairs):
        a = UnionFind()
        b = UnionFind()
        for x, y in pairs:
            a.union(str(x), str(y))
        for x, y in reversed(pairs):
            b.union(str(x), str(y))
        assert a.components() == b.components()


class TestHashing:
    @given(st.text(max_size=50), st.integers(0, 2**31))
    @settings(max_examples=200, deadline=None)
    def test_hash64_range(self, s, seed):
        h = hashing.hash64(s, seed)
        assert 0 <= h < 2**64

    @given(st.lists(words, min_size=1, max_size=30))
    @settings(max_examples=50, deadline=None)
    def test_simhash_self_distance_zero(self, toks):
        assert hashing.hamming64(hashing.simhash(toks), hashing.simhash(toks)) == 0


class TestNTriples:
    @given(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=20),
        st.text(max_size=40).filter(lambda s: "\r" not in s),
        st.sampled_from([None, "en", "fr"]),
    )
    @settings(max_examples=150, deadline=None)
    def test_literal_roundtrip(self, local, lit, lang):
        import pyarrow as pa

        subj = f"http://x.example/{local}"
        batch = pa.table(
            {"subj": [subj], "pred": ["skos:prefLabel"], "obj": [lit],
             "obj_lang": [lang], "obj_is_literal": [True]}
        )
        line = triples_to_ntriples(batch)["line"][0].as_py()
        parsed = parse_ntriples_line(line)
        assert parsed is not None
        s, p, o, l, is_lit = parsed
        assert (s, o, l, is_lit) == (subj, lit, lang, True)


class TestTrieScanEquivalence:
    """The token-trie scan must agree with the naive L-descending tuple
    probe on every input (they are the same greedy longest-match)."""

    @given(
        st.lists(st.sampled_from("a b c aa ab bc abc".split()), min_size=1, max_size=6,
                 unique=True),
        st.lists(st.sampled_from("a b c d".split()), max_size=40),
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_tuple_probe(self, terms, toks):
        from sifr_project_java_ontology_processing_ray.stages.mentions import (
            build_alias_index,
            trie_longest_match,
        )

        state = build_alias_index(terms)
        index, max_len, trie = state["index"], state["max_len"], state["trie"]

        def scan_tuple():
            out, i, n = [], 0, len(toks)
            while i < n:
                m = None
                for L in range(min(max_len, n - i), 0, -1):
                    term = index.get(tuple(toks[i : i + L]))
                    if term is not None:
                        m = (term, L)
                        break
                if m:
                    out.append((m[0], i))
                    i += m[1]
                else:
                    i += 1
            return out

        def scan_trie():
            out, i, n = [], 0, len(toks)
            while i < n:
                m = trie_longest_match(trie, toks, i)
                if m:
                    out.append((m[0], i))
                    i += m[1]
                else:
                    i += 1
            return out

        assert scan_tuple() == scan_trie()


class TestChunkSpans:
    @given(st.integers(min_value=0, max_value=500))
    @settings(max_examples=200, deadline=None)
    def test_full_coverage_and_stride(self, n):
        from sifr_project_java_ontology_processing_ray.pipelines.textops import (
            CHUNK_OVERLAP,
            CHUNK_TOKENS,
            chunk_token_spans,
        )

        spans = chunk_token_spans(n)
        if n == 0:
            assert spans == []
            return
        # every token covered; stride constant; no chunk starts at/after end
        covered = set()
        for s in spans:
            covered.update(range(s, min(n, s + CHUNK_TOKENS)))
            assert s < n
        assert covered == set(range(n))
        strides = {b - a for a, b in zip(spans, spans[1:])}
        assert strides <= {CHUNK_TOKENS - CHUNK_OVERLAP}


class TestBloomProperties:
    @given(st.sets(st.text(min_size=1, max_size=12), min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, keys):
        bf = hashing.BloomFilter(capacity=max(64, len(keys)))
        for k in keys:
            bf.add(k)
        assert all(k in bf for k in keys)


# ---- vectorized bucket assignment (VERDICT r2 wrong #4) -------------------

def test_bucket_ids_stable_and_key_consistent():
    import pyarrow as pa

    from sifr_project_java_ontology_processing_ray.state.grouped import bucket_ids

    t = pa.table(
        {"k": pa.array(["x", "y", "x", None, "z\x00w", "y"]),
         "n": pa.array([1, 2, 1, 3, 4, 2], pa.int64())}
    )
    b1 = bucket_ids(t, ["k", "n"], 64).to_pylist()
    b2 = bucket_ids(t, ["k", "n"], 64).to_pylist()
    assert b1 == b2
    assert b1[0] == b1[2] and b1[1] == b1[5]  # same key → same bucket
    # chunked input assigns identically (task-boundary independence)
    chunked = pa.Table.from_batches(t.to_batches(max_chunksize=2))
    assert bucket_ids(chunked, ["k", "n"], 64).to_pylist() == b1


def test_bucket_ids_cross_process_stable():
    """The hash_pandas_object trap: bucket assignment must be identical in
    a fresh interpreter (every Ray task is one)."""
    import subprocess
    import sys

    prog = (
        "import pyarrow as pa;"
        "from sifr_project_java_ontology_processing_ray.state.grouped import bucket_ids;"
        "t = pa.table({'k': pa.array(['alpha', 'beta', 'gamma'])});"
        "print(bucket_ids(t, ['k'], 1024).to_pylist())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True, check=True
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1


class TestDistributedSelection:
    """Exact k-th selection (histogram refinement) vs plain sort, across
    random data shapes and random block splits — the block-boundary /
    parallelism sensitivity the fixed-SF oracle gate cannot exercise."""

    @given(
        vals=st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                      allow_infinity=False, width=32),
            min_size=1, max_size=300,
        ),
        kfrac=st.floats(min_value=0.0, max_value=1.0),
        blocks=st.integers(min_value=1, max_value=7),
        data=st.data(),
    )
    @settings(max_examples=20, deadline=None)
    def test_matches_sorted_pick(self, ray_session, vals, kfrac, blocks, data):
        import pyarrow as pa

        from sifr_project_java_ontology_processing_ray.pipelines.relational import (
            distributed_kth_value,
        )
        from sifr_project_java_ontology_processing_ray.state.grouped import (
            dataset_from_table,
        )

        # duplicate-heavy variant half the time: equal values stress the
        # surviving-bin early exit
        if data.draw(st.booleans()):
            vals = vals + vals[: len(vals) // 2]
        k = min(len(vals) - 1, int(kfrac * len(vals)))
        tbl = pa.table({"v": pa.array(vals, pa.float64())})
        ds = dataset_from_table(
            tbl, target_rows=max(1, len(vals) // blocks)
        )
        got = distributed_kth_value(ds, "v", k)
        assert got == sorted(vals)[k]


def test_kth_value_modal_heavy_value_never_collects_rows(ray_session, monkeypatch):
    """A value whose multiplicity exceeds the collect gate must resolve via
    the per-VALUE count pass, not a row collect (driver-OOM guard), and
    still give the exact answer. Gate patched low so the scenario fits a
    unit test."""
    import numpy as np
    import pyarrow as pa

    from sifr_project_java_ontology_processing_ray.pipelines import relational
    from sifr_project_java_ontology_processing_ray.state.grouped import dataset_from_table

    monkeypatch.setattr(relational, "_QUANTILE_COLLECT_MAX", 8)
    vals = [49.99] * 500 + list(np.linspace(0.0, 10.0, 40)) + [100.0] * 7
    ds = dataset_from_table(pa.table({"v": pa.array(vals, pa.float64())}), target_rows=97)
    n = len(vals)
    for k in (0, n // 2, n - 1):
        assert relational.distributed_kth_value(ds, "v", k) == sorted(vals)[k]
    # multi-rank path shares scans and agrees with single-rank
    ks = [0, n // 4, n // 2, n - 1]
    assert relational.distributed_kth_values(ds, "v", ks) == [sorted(vals)[k] for k in ks]


class TestRoundSql:
    """round_sql must stay bit-identical to DuckDB round() — the session-9
    tie-rule mismatch (numpy half-even vs SQL half-away) produced 4 of the
    5 sf0.1 gate failures; this pins the kernel against both DuckDB and
    pyarrow's half_towards_infinity mode."""

    @given(
        vals=st.lists(
            st.one_of(
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                # exact ties at the rounding grid
                st.integers(min_value=-10**9, max_value=10**9).map(
                    lambda k: (k + 0.5) / 1e6
                ),
                st.integers(min_value=-10**7, max_value=10**7).map(
                    lambda k: (k + 0.5) / 1e2
                ),
            ),
            min_size=1, max_size=200,
        ),
        nd=st.sampled_from([2, 3, 4, 6, 9]),
    )
    @settings(max_examples=30, deadline=None)
    def test_matches_duckdb_and_arrow(self, vals, nd):
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from sifr_project_java_ontology_processing_ray.functions.numeric import round_sql

        got = round_sql(np.array(vals), nd)
        duck = np.array(
            [r[0] for r in duckdb.sql(
                f"SELECT round(v, {nd}) FROM (SELECT unnest(?::DOUBLE[]) AS v)",
                params=[vals],
            ).fetchall()]
        )
        arrow = pc.round(
            pa.array(vals, pa.float64()), ndigits=nd,
            round_mode="half_towards_infinity",
        ).to_numpy()
        assert (got == duck).all()
        assert (got == arrow).all()
