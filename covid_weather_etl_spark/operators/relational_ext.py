"""Relational extensions beyond the reference's SQL surface.

SURVEY.md §2.3/§2.5 notes what the reference never uses: "no
intersect/except anywhere", no subqueries (§4 "no subqueries in the
reference"), no ranking functions, no RANGE frames. A warehouse user
migrating from the reference's Postgres backend reaches for these on
day one, so the engine provides them as first-class oracle-checked
queries: INTERSECT / EXCEPT set ops, correlated EXISTS / scalar
subqueries (Catalyst decorrelates both into joins — no per-row
re-execution like Postgres' dependent subplans), ntile/percent_rank/
cume_dist ranking, and value-based RANGE window frames.

Scale notes (100 TB): set ops hash-shuffle on the full row (here: one
narrow key column — project before INTERSECT, never after); correlated
predicates become broadcast/shuffle semi- and anti-joins chosen by AQE;
ranking windows partition by nation so no single task sees the whole
table; the RANGE frame runs over a per-(nation, day) pre-aggregate —
days-per-nation rows, bounded state per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from covid_weather_etl_spark.functions.numeric import dsum, dsum_sql
from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables


@register(
    "repeat_buyers_intersect",
    survey="ext-setops,J1,P5",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    JOIN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) k ON k.o_custkey = c_custkey
    """,
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who ordered in BOTH 1996 and 1997. The key
    column is projected before the set op, so the intersect shuffles
    one bigint per row (Catalyst plans it as a distinct-aggregate +
    semi-join); the name lookup joins back to the customer dim."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"]
    y1 = (o.filter((F.col("o_orderdate") >= "1996-01-01")
                    & (F.col("o_orderdate") < "1997-01-01"))
           .select("o_custkey"))
    y2 = (o.filter((F.col("o_orderdate") >= "1997-01-01")
                    & (F.col("o_orderdate") < "1998-01-01"))
           .select("o_custkey"))
    both = y1.intersect(y2)
    return (t["customer"]
            .join(both, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name"))


@register(
    "lapsed_buyers_except",
    survey="ext-setops,J1,P5",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    JOIN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) k ON k.o_custkey = c_custkey
    """,
)
def lapsed_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered in 1996 but NOT in 1997 — the
    churn query. Same narrow-key discipline as the intersect; Catalyst
    plans EXCEPT as distinct + left-anti join. ``subtract`` (set
    semantics) — not ``exceptAll().distinct()``, which would keep keys
    whose 1996 multiplicity merely exceeds their 1997 multiplicity."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"]
    y1 = (o.filter((F.col("o_orderdate") >= "1996-01-01")
                    & (F.col("o_orderdate") < "1997-01-01"))
           .select("o_custkey"))
    y2 = (o.filter((F.col("o_orderdate") >= "1997-01-01")
                    & (F.col("o_orderdate") < "1998-01-01"))
           .select("o_custkey"))
    lapsed = y1.subtract(y2)
    return (t["customer"]
            .join(lapsed, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name"))


# Correlated-subquery SQL shared verbatim by engine and oracle: the
# engine runs it through spark.sql over temp views, the oracle through
# DuckDB — identical text proves the SQL surface, and the customer-mean
# comparison goes through exact DECIMAL so the predicate can't flip on
# last-ulp float noise.
_ABOVE_MEAN_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM {orders} o
WHERE o.o_totalprice > 1.5 * (
    SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*)
    FROM {orders} i
    WHERE i.o_custkey = o.o_custkey
)
AND NOT EXISTS (
    SELECT 1 FROM {orders} x
    WHERE x.o_custkey = o.o_custkey
      AND x.o_orderstatus = 'P'
)
"""


@register(
    "correlated_subquery_orders",
    survey="ext-subquery,J7,A9",
    oracle=_ABOVE_MEAN_SQL.format(orders="orders"),
)
def correlated_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + correlated NOT EXISTS, in one
    statement: orders 1.5× above their customer's mean order value,
    for customers with no pending ('P') order. Catalyst decorrelates
    the scalar subquery into an aggregate + equi-join and the NOT
    EXISTS into a left-anti join — set-at-a-time plans, not the
    per-row dependent subplan a row store would run. The engine and
    the oracle execute the SAME SQL text (exact decimal mean, so the
    theta predicate is order-independent)."""
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("ext_orders")
    return spark.sql(_ABOVE_MEAN_SQL.format(orders="ext_orders"))


@register(
    "decile_rank_customers",
    survey="ext-ranking,A6,W6",
    oracle="""
    SELECT c_custkey,
           n_name,
           revenue,
           CAST(ntile(10) OVER w AS INT)        AS revenue_decile,
           ROUND(percent_rank() OVER w, 6)      AS pct_rank,
           ROUND(cume_dist() OVER w, 6)         AS cume
    FROM (
        SELECT c_custkey, n_name,
               {rev} AS revenue
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, n_name
    )
    WINDOW w AS (PARTITION BY n_name ORDER BY revenue DESC, c_custkey)
    """.format(rev=dsum_sql("o_totalprice")),
)
def decile_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family the reference never had: per-nation
    revenue deciles (ntile), percent_rank and cume_dist over each
    customer's lifetime order value. The window partitions by nation —
    no global sort, each partition ranks independently (the 100 TB
    rule pinned by tests/test_plans.py::test_no_global_windows);
    revenue is an exact decimal sum so ranks can't flip on float
    noise, and the tie-break on custkey makes every rank
    deterministic."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "orders"))
    rev = (t["customer"]
           .join(F.broadcast(t["nation"]),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_custkey", "n_name")
           .agg(dsum("o_totalprice", "revenue")))
    w = (W.partitionBy("n_name")
         .orderBy(F.col("revenue").desc(), F.col("c_custkey")))
    return rev.select(
        "c_custkey", "n_name", "revenue",
        F.ntile(10).over(w).cast("int").alias("revenue_decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "range_frame_revenue",
    survey="ext-window,A7,W4",
    oracle="""
    SELECT n_name, day_num, daily_rev,
           CAST(SUM(CAST(daily_rev AS DECIMAL(25,6))) OVER (
                PARTITION BY n_name ORDER BY day_num
                RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_rev
    FROM (
        SELECT n_name,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day_num,
               {rev} AS daily_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, day_num
    )
    """.format(rev=dsum_sql("o_totalprice")),
)
def range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frame (vs the reference's row-count
    rolling windows, SURVEY W4): trailing-30-day revenue per nation.
    The frame is defined over day VALUES, so calendar gaps are handled
    correctly — a ROWS frame would silently span missing days. Runs
    over a per-(nation, day) pre-aggregate (days × nations rows, not
    order rows), and both the daily and the windowed sum accumulate in
    exact DECIMAL, keeping the result order-independent. Partitioned
    by nation: bounded per-task state at any scale."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    daily = (t["orders"]
             .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
             .join(F.broadcast(t["nation"]),
                   F.col("c_nationkey") == F.col("n_nationkey"))
             .groupBy("n_name",
                      F.datediff(F.to_date("o_orderdate"),
                                 F.lit("1970-01-01")).alias("day_num"))
             .agg(dsum("o_totalprice", "daily_rev")))
    w = (W.partitionBy("n_name").orderBy("day_num")
         .rangeBetween(-29, W.currentRow))
    trailing = (F.sum(F.col("daily_rev").cast("decimal(25,6)")).over(w)
                .cast("double"))
    return daily.select("n_name", "day_num", "daily_rev",
                        trailing.alias("trailing_30d_rev"))
