"""Bucketed co-located fact-fact join — the 100 TB shuffle eliminator.

The engine's fact-fact joins (`lineitem ⋈ orders` on orderkey — the
Spark restatement of the reference's metadata join chains,
`database/operations.py:131-143,211-228`) shuffle both sides on the
join key every run. At 100 TB that shuffle IS the query cost. The
standard lakehouse remedy is to pay the shuffle once at write time:
store both tables bucketed (hash-partitioned into the same number of
buckets) and sorted on the join key, after which every future join on
that key is a zero-exchange sort-merge join — bucket i of lineitem
joins bucket i of orders, co-located, no network.

This module materializes bucketed copies of `orders` and `lineitem`
(one-time, idempotent per scale factor) and exposes the co-located
join, with the plan property (zero Exchange nodes) pinned in
tests/test_bucketing.py. The registered query aggregates the join so
its values are oracle-checkable against the unbucketed tables —
bucketing is a physical layout choice and must not change results.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.functions.numeric import dsum, dsum_sql
from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

N_BUCKETS = 8

#: bucketed copies live under the repo's warehouse dir regardless of the
#: calling session's CWD/warehouse conf (the driver builds its own
#: vanilla session — its default warehouse would land outside the repo).
WAREHOUSE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "spark-warehouse")


def _db_for(sf_dir: str) -> str:
    tag = re.sub(r"[^0-9a-zA-Z]+", "_",
                 os.path.basename(os.path.normpath(sf_dir))).lower()
    return f"bucketed_{tag}"


def ensure_bucketed(spark: SparkSession, sf_dir: str) -> str:
    """Materialize bucketed+sorted copies of orders and lineitem for
    this scale factor (skipped when the tables already exist in the
    session catalog). The `repartition(N_BUCKETS, key)` before the
    write aligns write tasks with buckets so each bucket is exactly one
    file — which is what lets the read side skip both the exchange AND
    the sort. Returns the database name."""
    db = _db_for(sf_dir)
    loc = f"{WAREHOUSE_DIR}/{db}.db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    for name, df, key in (("orders_b", t["orders"], "o_orderkey"),
                          ("lineitem_b", t["lineitem"], "l_orderkey")):
        if spark.catalog.tableExists(f"{db}.{name}"):
            continue
        path = f"{loc}/{name}"
        spec = {"n_buckets": N_BUCKETS, "clustered_by": key, "sorted_by": key,
                "format": "parquet"}
        if os.path.exists(f"{path}/_SUCCESS") and _spec_matches(path, spec):
            # files survive across sessions; the in-memory catalog does
            # not. Re-register the existing bucketed files as an
            # external table with the same bucket spec instead of
            # rewriting — this is what makes the write-side shuffle a
            # genuinely one-time cost. Reattach ONLY when the spec
            # marker written alongside _SUCCESS matches the current
            # N_BUCKETS/key/sort: declaring a wrong bucketing would
            # make Spark plan an exchange-free join that silently
            # drops matches.
            cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                             for f in df.schema.fields)
            spark.sql(
                f"CREATE TABLE {db}.{name} ({cols}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {N_BUCKETS} BUCKETS LOCATION '{path}'")
        else:
            if os.path.exists(path):
                shutil.rmtree(path)  # stale/foreign layout: rewrite
            (df.repartition(N_BUCKETS, key)
               .write.format("parquet")
               .option("path", path)
               .bucketBy(N_BUCKETS, key).sortBy(key)
               .mode("overwrite")
               .saveAsTable(f"{db}.{name}"))
            with open(f"{path}/_BUCKET_SPEC.json", "w") as fh:
                json.dump(spec, fh)
    return db


def _spec_matches(path: str, spec: dict) -> bool:
    """True iff the on-disk spec marker equals the expected bucketing."""
    try:
        with open(f"{path}/_BUCKET_SPEC.json") as fh:
            return json.load(fh) == spec
    except (OSError, ValueError):
        return False


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on orderkey over the bucketed copies: both
    sides report the same HashPartitioning(orderkey, 8) from the
    bucketing metadata, so the sort-merge join plans with ZERO Exchange
    nodes (pinned in tests/test_bucketing.py). At 100 TB this turns the
    dominant per-query shuffle into a one-time write-side cost."""
    db = ensure_bucketed(spark, sf_dir)
    return spark.table(f"{db}.lineitem_b").join(
        spark.table(f"{db}.orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))


@register(
    "bucketed_colocated_join",
    survey="J1,J6",
    bench=True,
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {rev} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """.format(rev=dsum_sql("l_extendedprice")),
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order status through the co-located join. The only
    shuffle in the whole plan is the final 3-group aggregate; the
    fact-fact join itself is exchange-free. Results are oracle-checked
    against the plain (unbucketed) tables — identical by construction."""
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"),
             dsum("l_extendedprice", "revenue"))
    )


# ---------------------------------------------------------------------------
# salted join — the hot-key remedy when neither bucketing nor AQE applies
# ---------------------------------------------------------------------------

N_SALT = 4


@register(
    "salted_join_revenue",
    survey="J1,A6,skew",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {rev} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """.format(rev=dsum_sql("l_extendedprice")),
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly SALTED fact-fact join: the fact side's join key is
    widened to (key, salt) with a deterministic per-row salt, and the
    other side is exploded into all N_SALT salt replicas — a hot key's
    rows now spread over N_SALT tasks instead of one. The oracle is the
    PLAIN join aggregate: salting is a physical rewrite and must not
    change results (decimal-exact revenue makes the check bit-level).

    When to reach for it at 100 TB, in order: (1) bucketing
    (`ensure_bucketed`) removes the shuffle entirely for repeated
    joins; (2) AQE skew-join splitting (on in session.py) handles
    moderate skew at runtime; (3) explicit salting is the remaining
    tool when one key dominates AND the join is too hot or too custom
    for AQE — cost: the replicated side grows N_SALT×, so salt only
    the skewed key range in production (two-path union: salted hot
    keys + plain tail). Salt is `xxhash64(linenumber) % N_SALT` —
    deterministic, layout-independent, no RNG."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    fact = t["lineitem"].withColumn(
        "salt", F.pmod(F.xxhash64("l_linenumber"), F.lit(N_SALT)).cast("int"))
    other = (t["orders"]
             .withColumn("salt", F.explode(
                 F.array(*[F.lit(i) for i in range(N_SALT)]))))
    # the shuffle_hash hint forces the shuffled-join shape salting
    # exists for — at the audit SF Catalyst would otherwise broadcast
    # the small side and hide the salted exchange being demonstrated
    return (fact.hint("shuffle_hash")
            .join(other, (F.col("l_orderkey") == F.col("o_orderkey"))
                  & (fact["salt"] == other["salt"]))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"),
                 dsum("l_extendedprice", "revenue")))
