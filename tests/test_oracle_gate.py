"""In-suite oracle agreement: a fast subset of the DuckDB gate at sf0.001
(the driver runs the full gate at sf0.01; tools/check_oracle.py runs it all
locally)."""

import duckdb
import pandas as pd
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "pricing_summary",
    "collect_segments",
    "mfc_priority",
    "top_orders",
    "customers_per_region",
    "orders_without_lineitems",
    "events_value_buckets",
    "first_event",
    "event_sessions",
    "token_counts",
    "exact_dedup",
    "train_val_split",
    "vocab_top50",
    "doc_chunks",
    "repetition_stats",
    "pages_exact_dedup",
    "knn_top10",
    "orders_per_customer",
    "order_stats",
    "asof_latest_order",
    "bpeish_tokens",
    "fingerprints",
    "langid",
    "quality_scores",
    # round-4 oracles (fixture-driven; independent of sf_dir except kg_pr)
    "ngram_jaccard",
    "cosine_neardup_exact",
    "ivf_recall",
    "knn_ivf_multi",
    "event_windows_sliding",
    "stratified_sample",
    "value_quantiles",
    "skos_generation",
    "multilingual_clean",
    "reconciliation",
    "multimodal_decode",
    "frame_sample",
    "audio_decode",
    "kg_pr",
    "enrichment_pr",
    # curation/web ops added late in round 4
    "pii_redact",
    "domain_stats",
    "decontaminate",
    "latest_snapshot",
    "vocab_by_lang",
    "user_value_median",
    "seq_oracle_pr",
    "unigram_lm_score",
    # event-stream analytics family (session-5 additions)
    "user_running_total",
    "day_retention",
    "value_variance",
    "funnel_conversion",
    "collocations",
    "value_percentile",
    "json_field_stats",
    "inverted_index",
    # graph-analytics family + jsonl source (session-4 additions)
    "pagerank",
    "bfs_levels",
    "graph_components",
    "jsonl_token_stats",
    "degree_distribution",
    # session-6 additions
    "kcore",
    "hits",
    "quota_sample",
    "assortativity",
    "sequence_pack",
    "enrichment_cascade",
    "bpe_merges",
    # session-7 additions
    "topk_per_group",
    "qty_price_corr",
    "cube_revenue",
    "event_gaps",
    "hour_window_sum",
    "value_p90",
    "sssp",
    "orders_events_nearby",
    "pq_recall",
    "region_nation_cross",
    "approx_quantile_gate",
    "duplicate_sentences",
    "fuzzy_name_pairs",
    "event_transitions",
    "users_day_intersect",
    "users_day_except",
    "value_mad",
    "user_type_pivot",
    # session-8 additions
    "shipping_priority",
    "global_rank",
    "event_debounce",
    "longest_streak",
    "user_event_entropy",
    "user_value_trend",
    "user_value_zscore",
    "weighted_sample",
    "bigram_lm_score",
    "rrf_fusion",
    "pareto_orders",
    "table_profile",
    "daily_totals_filled",
    "click_attribution",
    "nb_langid",
    "label_centroids",
    "trimmed_mean",
    "attribution_delay",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def gate(ray_session, sf_small):
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return entry.queries(), entry.oracle_sql(), con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(gate, sf_small, name):
    queries, oracles, con = gate
    got = queries[name](sf_small)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(oracles[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b)
    # driver-strict: dtype KIND must agree (int64 3549 vs float64 3549.0
    # stringifies differently in the driver's value hash — ADVICE r1), then
    # floats compare with tolerance, everything else exactly
    for c in a.columns:
        a_float = pd.api.types.is_float_dtype(a[c])
        b_float = pd.api.types.is_float_dtype(b[c])
        assert a_float == b_float, f"{c}: dtype kind drift {a[c].dtype} vs {b[c].dtype}"
        if b_float:
            pd.testing.assert_series_equal(
                a[c].astype(float), b[c].astype(float), atol=1e-6, check_names=False
            )
        else:
            assert a[c].tolist() == b[c].tolist(), c
