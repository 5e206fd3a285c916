"""Plan-shape regression tests: the performance properties docs/SCALE.md
claims are asserted here so a refactor that silently loses pushdown, a
broadcast, or the window group-limit fails CI — correctness tests can't
catch plan regressions."""

from __future__ import annotations

import contextlib
import io

import pytest

from sql_redshift_etl_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "flagship_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed to parquet scan"
    assert "partial_sum" in plan, "map-side partial aggregation missing"
    assert "ReadSchema" in plan, "no ReadSchema in formatted explain (Spark output changed?)"
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0], "column pruning lost"


def test_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan, "no PushedFilters in formatted explain (Spark output changed?)"
    scan = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan, f"{col} predicate not pushed: {scan}"


def test_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "join_star_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, "nation/region not broadcast"


def test_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "window_topk_per_group")
    assert "WindowGroupLimit" in plan, "rank-limit pushdown (WindowGroupLimit) missing"


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "topk_global_revenue")
    assert "TakeOrderedAndProject" in plan, "global top-k planned as full sort"


def test_semi_join_planned(spark):
    plan = plan_of(spark, "join_semi_exists")
    assert "LeftSemi" in plan


def test_correlated_subquery_decorrelated(spark):
    plan = plan_of(spark, "subquery_correlated_scalar")
    assert "Join" in plan and "HashAggregate" in plan
    assert "Subquery" not in plan, "correlated subquery not decorrelated"


@pytest.mark.parametrize(
    "name", ["flagship_pricing_summary", "join_star_revenue", "events_tumbling_daily"]
)
def test_no_python_udf_in_hot_paths(spark, name):
    plan = plan_of(spark, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"{name}: Python on the hot path ({marker})"


def test_plpythonu_udf_is_arrow_batched(spark):
    # plpythonu registers as a pandas UDF: the plan must show the
    # Arrow-batched evaluator (ArrowEvalPython), never the row-at-a-time
    # pickling path (BatchEvalPython — the banned @udf evaluator), and
    # the aggregation above it stays JVM-side.
    plan = plan_of(spark, "redshift_script_python_udf")
    assert "ArrowEvalPython" in plan, f"pandas-UDF evaluator missing:\n{plan[:1500]}"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python evaluator in plan"
    assert "HashAggregate" in plan


def test_flagship_decimal_products_stay_long_backed(spark):
    # dialect.money/rate contract: no product in the flagship exceeds
    # precision 18, so Tungsten sums longs, not java.math.BigDecimal.
    plan = plan_of(spark, "flagship_pricing_summary")
    import re

    for p, s in ((int(m.group(1)), int(m.group(2)))
                 for m in re.finditer(r"decimal\((\d+),(\d+)\)", plan)):
        if s > 0 and p <= 28:  # sum accumulators widen +10; inputs must be <=18
            continue
        assert p <= 38, plan


def test_minhash_signing_is_shuffle_free(spark):
    # The signature stage is row-local: the only exchanges allowed are the
    # one compact per-doc repartition (the reuse point), the band
    # self-join, and the candidate distinct. No exploded-shingle shuffle.
    import re

    plan = plan_of(spark, "dedup_minhash_lsh")
    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan))
    assert n_exchanges <= 8, f"minhash shuffle count regressed ({n_exchanges}):\n{plan[:2000]}"
    assert "collect_set" not in plan, "shingle sets should be row-local array_distinct"


def test_repetition_scores_no_shuffle(spark):
    # Row-local scoring: a single sort for the ORDER BY is the only
    # exchange permitted.
    import re

    plan = plan_of(spark, "curation_repetition_scores")
    assert "HashAggregate" not in plan, "repetition metrics must not aggregate"
    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan))
    assert n_exchanges <= 1, "row-local scoring gained a shuffle"


def test_contamination_probe_is_broadcast(spark):
    plan = plan_of(spark, "curation_contamination_check")
    assert "BroadcastHashJoin" in plan, "probe set must broadcast, never shuffle the corpus"


def test_domain_cap_single_shuffle_and_stratified_group_limit(spark):
    import re

    # The cap+report form needs every row (it reports BEFORE counts), so
    # the bar is: exactly one data shuffle (the per-source window), with
    # the aggregation folded on top, partial-first.
    plan = plan_of(spark, "curation_domain_cap")
    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan))
    assert n_exchanges <= 2, "domain cap gained a shuffle beyond window + order"
    assert "partial_count" in plan, "per-source aggregation lost its partial phase"
    # The keep-only-capped-rows form IS the W6 group-limit shape:
    plan2 = plan_of(spark, "sample_stratified_per_label")
    assert "WindowGroupLimit" in plan2, "stratified sample lost WindowGroupLimit"


def test_quantize_is_row_local(spark):
    plan = plan_of(spark, "embedding_quantize_int8")
    assert "HashAggregate" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python on the quantization hot path ({marker})"


def test_bucketed_join_has_no_pre_join_exchange(spark):
    import re

    # DISTKEY property: both sides bucketed 8-ways on the join key ⇒ the
    # join needs no shuffle. At fixture scale the tiny orders side would
    # statically broadcast (also shuffle-free, but not the property under
    # test), so disable broadcast to force the co-located merge join.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "source_bucketed_distkey_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan, "scan not reading bucketed layout"
    # Only the post-join aggregation + final ORDER BY may exchange; the
    # join inputs read bucketed and stay in place.
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, f"bucketed join gained a pre-join shuffle:\n{plan[:1500]}"


def test_tfidf_broadcasts_vocab_and_group_limits(spark):
    plan = plan_of(spark, "text_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan, "df (vocabulary) table not broadcast back to tf"
    assert "WindowGroupLimit" in plan, "per-doc rank-3 filter not pushed below the window shuffle"


def test_shard_assignment_is_row_local(spark):
    # The assignment expression itself must be shuffle-free: project-only
    # plan from scan to the partitioned write input.
    import io as _io
    import contextlib as _ctx

    from pyspark.sql import functions as F

    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm.curation import N_SHARDS
    from sql_redshift_etl_spark.llm.sampling import hash_hex

    d = load_table(spark, SF_DIR, "documents")
    assigned = d.select(
        "doc_id",
        (F.conv(F.substring(hash_hex(F.col("doc_id")), 1, 2), 16, 10).cast("long") % N_SHARDS)
        .alias("shard_id"),
    )
    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        assigned.explain("formatted")
    assert "Exchange" not in buf.getvalue(), "shard assignment must not shuffle"


def test_q5_snowflake_broadcasts_dims(spark):
    # region→nation→supplier chain plus customer dim: every dimension
    # side must broadcast; only the fact tables may shuffle-exchange.
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3, "q5 dims not broadcast"
    assert "CartesianProduct" not in plan
    assert "PushedFilters:" in plan
    assert "o_orderdate" in plan, "orders date range filter lost"


def test_q8_snowflake_broadcasts_all_dims(spark):
    # 8-table snowflake: part (filtered), supplier, nation ×2, region all
    # broadcast; exchanges only on the lineitem⋈orders⋈customer keys.
    plan = plan_of(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5, "q8 dimension broadcasts regressed"
    assert "CartesianProduct" not in plan
    scan_filters = plan.split("PushedFilters:")
    assert any("p_type" in s.splitlines()[0] for s in scan_filters[1:]), "p_type filter not pushed to part scan"


def test_q18_semi_filter_before_wide_join(spark):
    # The HAVING subquery must plan as a semi join against the aggregated
    # (tiny) key set — not re-aggregate inside a correlated subquery.
    plan = plan_of(spark, "q18_large_volume_customer")
    assert "LeftSemi" in plan, "big-order key set not applied as a semi join"
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, "q18 LIMIT 100 planned as full sort"


def test_corpus_pipeline_stays_jvm_side_and_no_cartesian(spark):
    # The 5-stage composite must inherit every stage's scale shape: no
    # cartesian anywhere (the LSH band join is an equi self-join), and
    # zero Python on the hot path.
    plan = plan_of(spark, "etl_training_corpus_pipeline")
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python on the corpus pipeline hot path ({marker})"


def test_ann_pruned_scan_reads_only_probe_partitions(spark):
    """sim_ann_lsh_pruned's whole point: the bucket partition filter must
    prune STATICALLY — PartitionFilters carries the IN-list, and the
    files actually read at execution stay inside the 37-bucket probe
    set (out of up to 256 written bucket directories)."""
    from pyspark.sql import functions as F

    plan = plan_of(spark, "sim_ann_lsh_pruned")
    assert "PartitionFilters:" in plan, "bucket filter not a partition filter"
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "bucket" in pf and ("INSET" in pf or "IN (" in pf), pf

    # Physical proof: files touched at execution are only probe buckets.
    # (input_file_name() on the full query is blank past the top-k
    # shuffle, so probe the pruned scan itself — same path + filter the
    # builder just ran and wrote.)
    import os

    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm import similarity as S

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "_scratch", "io", os.path.basename(SF_DIR.rstrip("/")), "ann_bucketed")
    b = load_table(spark, SF_DIR, "embeddings").withColumn("bucket", S.lsh_bucket_col())
    qbucket = b.where(F.col("vec_id") == S.QUERY_VEC_ID).select("bucket").first()[0]
    probes = set(S.probe_buckets(qbucket))
    stored = spark.read.schema(b.schema).option("basePath", root).parquet(root)
    files = [
        r[0]
        for r in stored.where(F.col("bucket").isin(*probes))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert files, "no files read"
    buckets_read = {f.split("bucket=")[1].split("/")[0] for f in files}
    assert buckets_read <= probes, f"read outside probe set: {sorted(buckets_read - probes)[:5]}"
    assert len(buckets_read) <= 37, f"read {len(buckets_read)} bucket dirs, expected <= 37"
    written = [d for d in os.listdir(root) if d.startswith("bucket=")]
    assert len(written) > 37 * 2, f"fixture wrote only {len(written)} buckets — pruning proof weak"


def test_knn_batch_group_limits_and_broadcasts_queries(spark):
    # Batch retrieval's scale shape: the query batch is broadcast (never
    # a shuffle of the corpus against Q rows) and the per-query top-k is
    # a WindowGroupLimit (k rows per map partition reach the q_id
    # shuffle, not the Q×n score matrix).
    plan = plan_of(spark, "sim_knn_batch")
    assert "WindowGroupLimit" in plan, "per-query top-k not pushed below the window shuffle"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        "query batch not broadcast"
    )
    assert "CartesianProduct" not in plan


def test_embedding_ann_dedup_no_cartesian_and_compact_band_join(spark):
    # The banded sign-LSH dedup must candidate-generate via an equi
    # self-join on (band, sig) — never a cartesian — and keep Python off
    # the path (signature is JVM higher-order functions).
    plan = plan_of(spark, "dedup_embedding_ann")
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python on the ANN dedup path ({marker})"


def test_knn_batch_ann_bucket_equi_join(spark):
    # The batched ANN's probe join must be an EQUI join on bucket (the
    # probe relation broadcast) — never a nested-loop Hamming filter —
    # with the per-query top-k still a WindowGroupLimit.
    plan = plan_of(spark, "sim_knn_batch_ann")
    assert "BroadcastHashJoin" in plan, "probe-set join not an equi hash join"
    assert "BroadcastNestedLoopJoin" not in plan, "ANN batch degraded to a nested loop"
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_jdbc_roundtrip_reads_partitioned(spark):
    # The S3 pull must be a PARTITIONED range scan (8 parallel
    # connections), not one connection dragging the table.
    plan = plan_of(spark, "source_jdbc_roundtrip")
    assert "JDBCRelation" in plan, "JDBC scan missing from plan"
    assert "numPartitions=8" in plan, "JDBC read not partitioned 8-way"


def test_embedding_ann_carries_vectors_through_band_join(spark):
    """r5 carry plan: the ANN verify must NOT join vectors back per
    candidate pair (that shape shuffles O(candidates·dim) — measured
    ~240 GB of spill at the sf100 tier). Exactly ONE join may appear:
    the band self-join, with the cosine computed inline from carried
    columns. A second join = the O(candidates·dim) shape regressed."""
    import re

    for name in ("dedup_embedding_ann", "dedup_embedding_ann_scaled"):
        plan = plan_of(spark, name)
        # "(N) XJoin" detail headers — the formatted plan repeats operator
        # names in the tree section, so count unique operator instances.
        joins = re.findall(
            r"\(\d+\)\s+(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)\b",
            plan,
        )
        assert len(joins) == 1, f"{name}: expected only the band self-join, saw {joins}"


def test_script_merge_into_plans_single_full_outer(spark):
    """The MERGE INTO script path (r6) must lower to the documented
    relational plan: key-partitioned SortMergeJoin FullOuter, no
    cartesian, no Python in the plan; the multiple-match guard is a
    window count on the (small) source side only."""
    plan = plan_of(spark, "redshift_script_merge_into")
    assert "FullOuter" in plan, "MERGE plan lost its full-outer join"
    assert "Cartesian" not in plan, "MERGE plan degenerated to a cartesian product"
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    # the guard's window count appears per MERGE statement (2 in the
    # registered script), partitioned by the merge key
    assert plan.count("windowspecdefinition(c_custkey") >= 2, (
        "multiple-match guard window missing from the source side"
    )


def test_script_merge_remove_dups_plans_anti_plus_window(spark):
    """The simplified MERGE (REMOVE DUPLICATES) is one LeftAnti join for
    survivors plus one row_number window for the replacement pick — two
    key shuffles, no row explosion, no cartesian."""
    plan = plan_of(spark, "redshift_script_merge_remove_dups")
    assert "LeftAnti" in plan, "survivor anti-join missing"
    assert "row_number" in plan, "replacement-pick window missing"
    assert "Cartesian" not in plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_gap_fill_broadcasts_spine_and_single_window(spark):
    """events_gap_fill_locf (r6): the spine is built from tiny frames
    and broadcast into the left join; LOCF is exactly one Window node;
    the value>300 rollup filter reaches the scan."""
    plan = plan_of(spark, "events_gap_fill_locf")
    assert plan.count("BroadcastExchange") >= 2, "spine/daily not broadcast"
    import re as _re

    assert len(_re.findall(r"(?m)^\(\d+\) Window", plan)) == 1, (
        "LOCF should be one window pass"
    )
    assert "PushedFilters" in plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_partiql_unnest_is_row_local_generate(spark):
    """PartiQL unnest lowers to Generate (posexplode) with the vec_id
    predicate pushed to the scan — no shuffle, no cartesian."""
    plan = plan_of(spark, "partiql_unnest_embeddings")
    assert "Generate" in plan, "unnest did not lower to Generate"
    assert "Cartesian" not in plan
    assert "Exchange" not in plan.replace("ReusedExchange", ""), (
        "row-local unnest acquired a shuffle"
    )


def test_named_window_single_sort_window_pass(spark):
    """window_named_clause: the three shared-window functions must run
    in ONE Sort for the named window (plus the independent COUNT
    partition) — the clause's entire point."""
    plan = plan_of(spark, "window_named_clause")
    import re as _re

    assert len(_re.findall(r"(?m)^\(\d+\) Window", plan)) <= 2, (
        "named window split into extra passes"
    )
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_pca_partials_have_no_vector_shuffle(spark):
    """fit_pca's covariance stage: the only movement after the scan is
    the single-partition coalesce of (d²+d+1)-double partials — no
    Exchange of vector data."""
    from sql_redshift_etl_spark.catalog import load_table
    from sql_redshift_etl_spark.llm.pca import _PARTIAL_SCHEMA, _partial_covariance

    import contextlib
    import io

    emb = load_table(spark, SF_DIR, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        _partial_covariance, schema=_PARTIAL_SCHEMA
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        partials.coalesce(1).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, "covariance partials acquired a shuffle"
    assert "Coalesce" in plan


def test_substring_spans_broadcasts_and_bounded_shuffles(spark):
    """Exact-substring span dedup: the duplicated-window set and the
    per-doc token counts join back via BROADCAST (the dup set is small
    by construction); shuffles are bounded to the window-key groupBy,
    the per-doc span window, and the final per-doc agg; no Python on
    the path."""
    plan = plan_of(spark, "dedup_substring_spans")
    assert "BatchEvalPython" not in plan, "Python UDF crept into the span path"
    assert plan.count("BroadcastExchange") >= 2, "dup-set/token joins not broadcast"
    hash_exchanges = sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and "Exchange" in line
        and "Broadcast" not in line
        and "Reused" not in line
    )
    assert hash_exchanges <= 4, f"span pipeline grew extra shuffles: {hash_exchanges}"


def test_scd2_broadcasts_delta_and_plans_leftanti(spark):
    """SCD2 dimension maintenance (r8): both staged-delta matches plan
    as BroadcastHashJoin (the delta side is small by construction —
    broadcasting it is the 100 TB shape), the NOT EXISTS version guard
    plans as a LeftAnti join, and no Python creeps onto the path —
    mirrors the docs/PLANS.md bullet so the doc can't drift from CI."""
    plan = plan_of(spark, "redshift_script_scd2_dimension")
    assert "BatchEvalPython" not in plan, "Python UDF crept into the SCD2 path"
    assert plan.count("BroadcastHashJoin") >= 2, "staged delta not broadcast"
    assert "LeftAnti" in plan, "NOT EXISTS did not plan as an anti join"


def test_substring_cut_and_incremental_plan_shapes(spark):
    """The r8 span-family additions keep the spans operator's plan
    discipline: the small sides (dup window set; per-doc hit lists;
    stored-key probe result) join back via BROADCAST, shuffles stay
    bounded (cut: window-key groupBy + hit collect + nothing else;
    incremental: one extra for the delta-key probe), and no Python
    appears anywhere."""
    for name, max_hash in (
        ("dedup_substring_cut", 4),
        ("dedup_substring_incremental", 5),
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, f"{name}: Python crept in"
        assert plan.count("BroadcastExchange") >= 2, f"{name}: joins not broadcast"
        hash_exchanges = sum(
            1
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line and "Reused" not in line
        )
        assert hash_exchanges <= max_hash, (
            f"{name}: pipeline grew extra shuffles ({hash_exchanges})"
        )


def test_ann_incremental_probe_is_broadcast_equi_join(spark):
    """r9 incremental ANN: only the DELTA is signed (the stored corpus
    relation contributes its persisted bucket column), the 37-probe
    relation joins the stored buckets as a BROADCAST EQUI join — never a
    nested-loop Hamming filter — and per-new-vector top-k stays a
    WindowGroupLimit. Zero Python anywhere."""
    plan = plan_of(spark, "sim_ann_incremental")
    assert "BroadcastHashJoin" in plan, "stored-bucket probe not an equi hash join"
    assert "BroadcastNestedLoopJoin" not in plan, "incremental ANN degraded to a nested loop"
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python on the incremental ANN path ({marker})"


def test_pinned_kmeans_plan_shape(spark):
    """sim_ivf_kmeans_pinned (r10): Lloyd must stay distributed-cheap —
    assignment is a row-local projection against ONE broadcast centroid
    row (BroadcastNestedLoopJoin of a singleton — the deliberate
    broadcast-singleton crossJoin pattern, never a CartesianProduct),
    the mean update's shuffles emit k×dim rows with map-side partials,
    and no Python evaluator appears anywhere (pure Catalyst end to
    end)."""
    plan = plan_of(spark, "sim_ivf_kmeans_pinned")
    assert "CartesianProduct" not in plan, "non-broadcast cartesian in Lloyd plan"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "Python evaluator in a pure-Catalyst plan"
    )
    assert "partial_sum" in plan, "centroid mean update lost map-side partials"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "centroid set not broadcast to the assignment projection"
    )


def test_strdesc_siblings_plans_take_ordered(spark):
    """r11: the string-DESC siblings walk's ORDER BY __cbs LIMIT 40 must
    plan as TakeOrderedAndProject (partial top-k per partition, no global
    sort materialization) — the docstring's scale claim."""
    plan = plan_of(spark, "redshift_sql_order_siblings_strdesc")
    assert "TakeOrderedAndProject" in plan, f"global-sort LIMIT regressed:\n{plan[:1500]}"


# The r14 bounded-domain sort sweep (catalog.bounded_sort): each of these
# queries sorts a bounded result, so its final plan must never contain an
# Exchange rangepartitioning (whose RangePartitioner runs a separate
# sampling job). Two pinned forms (ADVICE r13: nothing pinned the
# flagship's coalesce; at sf0.001 AQE yields one partition so a dropped
# coalesce would regress silently):
# - coalesce form: Coalesce(1) + local Sort — only where the nearest
#   exchange below is a bounded-domain final aggregate;
# - barrier form: Exchange SinglePartition + local Sort — where the
#   stage above the last exchange is unbounded (q11/q15 aggregate
#   merges, stratified's window walk, pii's exchange-free scan) and a
#   coalesce would serialize it.
BOUNDED_SORT_COALESCE_QUERIES = (
    "flagship_pricing_summary",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q12_late_shipment_priority",
    "q13_order_count_distribution",
    "q16_supplier_variety",
    "q22_dormant_accounts",
    "curation_shard_export",
    "sample_hash_fraction",
    "sample_train_val_test",
    "sample_salted_hot_agg",
    "sample_domain_temperature",
    "embedding_pca_project",
    "source_bucketed_distkey_join",
)
BOUNDED_SORT_BARRIER_QUERIES = (
    "q11_important_value_share",
    "q15_top_supplier",
    "curation_pii_redaction",
    "sample_stratified_per_label",
)


@pytest.mark.parametrize("name", BOUNDED_SORT_COALESCE_QUERIES)
def test_bounded_sort_plans_coalesce_local_sort(spark, name):
    plan = plan_of(spark, name)
    assert "rangepartitioning" not in plan, (
        f"{name}: bounded-domain sort regressed to Exchange rangepartitioning"
    )
    assert "Coalesce" in plan, f"{name}: coalesce(1) missing — local sort is not a total order"
    assert "Sort (" in plan, f"{name}: final sort missing entirely"


@pytest.mark.parametrize("name", BOUNDED_SORT_BARRIER_QUERIES)
def test_bounded_sort_plans_single_partition_barrier(spark, name):
    plan = plan_of(spark, name)
    assert "rangepartitioning" not in plan, (
        f"{name}: bounded-domain sort regressed to Exchange rangepartitioning"
    )
    assert "SinglePartition" in plan, (
        f"{name}: SinglePartition barrier missing — either the total order is "
        "lost or a coalesce is serializing the unbounded stage below"
    )
    assert "Coalesce" not in plan, (
        f"{name}: Coalesce would narrow the unbounded stage below the last "
        "exchange to one task (r14 self-review finding)"
    )
    assert "Sort (" in plan, f"{name}: final sort missing entirely"
