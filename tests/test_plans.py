"""Physical-plan assertions — the properties that make plans survive a
100 TB scale-up, pinned as tests: no global (unpartitioned) windows
anywhere in the registry, dimension joins broadcast, filters reach the
parquet scan, and projections prune the read schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid_weather_etl_spark.plans import inspect as I
from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


#: fast-run canary subset for the zero-global-windows bar — the full
#: registry sweep below is `slow` (350 plan builds ≈ minutes) and runs
#: at close; this sample keeps a default-run tripwire on the operator
#: families most likely to regress (windows, ranking, iterative).
_GW_CANARY = [
    "pricing_summary_q1", "session_windows", "rolling_median_revenue",
    "topk_orders_per_customer", "pagerank_suppliers", "dedup_keep_longest",
    "mad_anomaly_report", "compaction_plan", "epoch_shuffle_plan",
    "decile_rank_customers", "range_frame_revenue", "scd2_dim_history",
    "corpus_curation_funnel", "curation_pipeline_run", "sq8_recall_eval",
    "kaplan_meier_conversion", "spearman_correlation", "session_stats",
    "sarima_hr_forecast_eval", "weighted_median_price",
]


@pytest.mark.parametrize("name", _GW_CANARY)
def test_no_global_windows_canary(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert I.global_window_count(df) == 0, I.physical_plan(df)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_global_windows(spark, name):
    """A window without partition columns funnels every row through one
    task — fatal at scale. Zero tolerance across the whole registry."""
    df = QUERIES[name].fn(spark, SF_DIR)
    assert I.global_window_count(df) == 0, I.physical_plan(df)


@pytest.mark.parametrize("name", [
    "pipeline_status", "join_chain_4way_revenue", "ols_trend_per_group",
    "seasonal_decompose", "cosine_topk",
])
def test_dim_joins_broadcast(spark, name):
    """Dimension-table joins must be broadcast-hash, never shuffled."""
    df = QUERIES[name].fn(spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 1, I.physical_plan(df)


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
          .filter(F.col("o_totalprice") > 1000.0)
          .select("o_orderkey"))
    assert I.has_pushed_filters(df)


def test_column_pruning_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
          .select("o_orderkey", "o_totalprice"))
    cols = I.scan_read_columns(df)
    assert cols and all(set(c) <= {"o_orderkey", "o_totalprice"}
                        for c in cols), cols


def test_flagship_query_stays_pruned(spark):
    """pipeline_status must not read full rows of orders/lineitem."""
    df = QUERIES["pipeline_status"].fn(spark, SF_DIR)
    for cols in I.scan_read_columns(df):
        assert len(cols) <= 6, cols


def test_whole_stage_codegen_present(spark):
    df = QUERIES["join_chain_4way_revenue"].fn(spark, SF_DIR)
    assert I.codegen_stage_count(df) >= 1


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """The at-scale gold layout partitions by the dominant filter
    column (SCALE.md §1); a filter on it must become a PartitionFilter
    (directories skipped at planning time), not a row filter."""
    from covid_weather_etl_spark.sources.catalog import load_tables
    path = str(tmp_path / "part_events")
    (load_tables(spark, SF_DIR, ("events",))["events"]
     .write.partitionBy("event_type").parquet(path))
    df = (spark.read.parquet(path)
          .filter(F.col("event_type") == "purchase")
          .select("event_id"))
    plan = I.physical_plan(df)
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    n_purchase = df.count()
    total = spark.read.parquet(path).count()
    assert 0 < n_purchase < total


@pytest.mark.parametrize("name,max_shuffles", [
    ("minhash_near_dup", 5),       # spread repartitions + final sort only
    ("embedding_near_dup", 2),     # block-pair shuffle (+AQE coalesce slack)
    ("hash_stratified_sample", 0), # pure narrow map
    ("salted_join_revenue", 3),    # both salted sides + final agg
])
def test_shuffle_budgets_hold(spark, name, max_shuffles):
    """Regression pins for the audited shuffle counts of the scale-path
    operators — a refactor that silently doubles exchanges fails here,
    not at 100 TB."""
    df = QUERIES[name].fn(spark, SF_DIR)
    assert I.count_shuffles(df) <= max_shuffles, I.physical_plan(df)


def test_q6_predicates_and_pruning_reach_scan(spark):
    """forecast_revenue_change is the pushdown litmus: all three
    predicates AND the 4-column projection must reach the parquet
    scan, and the plan must contain no join and exactly one shuffle
    (the single-row final aggregate exchange)."""
    df = QUERIES["forecast_revenue_change"].fn(spark, SF_DIR)
    assert I.has_pushed_filters(df), I.physical_plan(df)
    cols = I.scan_read_columns(df)
    assert cols and all(len(c) <= 4 for c in cols), cols
    plan = I.physical_plan(df)
    assert "Join" not in plan, plan
    assert I.count_shuffles(df) <= 1, plan


def test_q19_dim_prune_feeds_broadcast(spark):
    """disjunctive_brand_revenue must broadcast the PRUNED part dim
    (never shuffle the fact for the join) and push the fact-only
    quantity bound into the lineitem scan."""
    df = QUERIES["disjunctive_brand_revenue"].fn(spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 1, I.physical_plan(df)
    assert I.has_pushed_filters(df), I.physical_plan(df)


def test_incremental_ingest_has_no_cartesian(spark):
    """The band self-join must be an equi-join on (band, key) — any
    CartesianProduct/BroadcastNestedLoop here means the LSH bucketing
    failed to become the join key."""
    df = QUERIES["incremental_minhash_ingest"].fn(spark, SF_DIR)
    plan = I.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
