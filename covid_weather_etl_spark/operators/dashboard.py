"""Dashboard query twins — the reference Streamlit monitor's remaining
SQL shapes (`streamlit/etl_logs.py`), re-expressed over the driver's
star schema.

The reference dashboard queries a three-stage ETL log chain
(extract.import_logs → transform.logs → load.logs, each stage FK'd to
the previous, plus the extract.country dimension). The analog chain
here is orders (extract stage, customer→nation dimension hop) →
lineitem (transform stage, FK l_orderkey) → the finished subset of
lineitem, l_linestatus = 'F' (load stage, 1:1 FK on the line's
composite key). Every query keeps the reference's shape: the
LEFT-JOIN stage-survival probes, the CASE-WHEN status labels, the
per-date distinct-counts trend, and the tie-broken ORDER BY … DESC
LIMIT log tables.

Scale notes (100 TB): nation (25 rows) broadcasts explicitly; the
customer hop is left to Catalyst/AQE — dimension-sized here, but at
100 TB it is a fact-fact join that must shuffle (or come pre-bucketed);
the stage-probe joins shuffle once on orderkey — the bucketed layout in
operators/bucketing.py removes even that for the hot chain; the
LIMIT-1000 log tables are TakeOrderedAndProject (per-partition top-k,
then a k-row merge on the driver — never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

#: dashboard date-range filter (the reference interpolates
#: start_date/end_date widgets into every query)
DATE_LO, DATE_HI = "1994-01-01", "1996-12-31"

#: synthetic stable id for a lineitem row (l_linenumber ≤ 7 in
#: TPC-H-shaped data, so ×10 cannot collide)
_LINE_ID_SQL = "l_orderkey * 10 + l_linenumber"


def _line_id() -> F.Column:
    return F.col("l_orderkey") * 10 + F.col("l_linenumber")


@register(
    "backfill_file_counts",
    survey="dash-backfill,A6,A7,J2",
    oracle=f"""
    SELECT n_name AS country,
           CAST(o_orderdate AS DATE) AS backfill_date,
           COUNT(*) AS file_count
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate IS NOT NULL
      AND o_orderdate BETWEEN TIMESTAMP '{DATE_LO}' AND TIMESTAMP '{DATE_HI}'
    GROUP BY 1, 2
    """,
)
def backfill_file_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill analysis (reference `streamlit/etl_logs.py:505-516`):
    per-(country, backfill day) file counts over a date-range window —
    the count shuffles once on the composite group key."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    return (
        t["orders"]
        .filter(F.col("o_orderdate").isNotNull()
                & F.col("o_orderdate").between(DATE_LO, f"{DATE_HI} 00:00:00"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("country"),
                 F.to_date("o_orderdate").alias("backfill_date"))
        .agg(F.count("*").alias("file_count"))
    )


@register(
    "etl_time_trend",
    survey="dash-trend,J4,A2,A7",
    oracle=f"""
    SELECT CAST(o.o_orderdate AS DATE) AS process_date,
           COUNT(DISTINCT o.o_orderkey) AS extractions,
           COUNT(DISTINCT t.l_orderkey * 10 + t.l_linenumber) AS transformations,
           COUNT(DISTINCT ld.l_orderkey * 10 + ld.l_linenumber) AS loads
    FROM orders o
    LEFT JOIN lineitem t ON t.l_orderkey = o.o_orderkey
    LEFT JOIN (SELECT * FROM lineitem WHERE l_linestatus = 'F') ld
           ON ld.l_orderkey = t.l_orderkey
          AND ld.l_linenumber = t.l_linenumber
    WHERE o.o_orderdate BETWEEN TIMESTAMP '{DATE_LO}' AND TIMESTAMP '{DATE_HI}'
    GROUP BY 1
    """,
)
def etl_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day stage-survival trend (reference
    `streamlit/etl_logs.py:240-254`): distinct entities alive at each
    pipeline stage, via the same LEFT-JOIN chain — rows that never
    reached a stage contribute NULLs that COUNT(DISTINCT) ignores."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"]
    trans = li.select(F.col("l_orderkey").alias("t_orderkey"),
                      F.col("l_linenumber").alias("t_linenumber"),
                      _line_id().alias("t_id"))
    loads = (li.filter(F.col("l_linestatus") == "F")
             .select(F.col("l_orderkey").alias("ld_orderkey"),
                     F.col("l_linenumber").alias("ld_linenumber"),
                     _line_id().alias("ld_id")))
    return (
        t["orders"]
        .filter(F.col("o_orderdate").between(DATE_LO, f"{DATE_HI} 00:00:00"))
        .join(trans, F.col("t_orderkey") == F.col("o_orderkey"), "left")
        .join(loads, (F.col("ld_orderkey") == F.col("t_orderkey"))
              & (F.col("ld_linenumber") == F.col("t_linenumber")), "left")
        .groupBy(F.to_date("o_orderdate").alias("process_date"))
        .agg(F.countDistinct("o_orderkey").alias("extractions"),
             F.countDistinct("t_id").alias("transformations"),
             F.countDistinct("ld_id").alias("loads"))
    )


@register(
    "extract_logs_table",
    survey="dash-logs,J4,W7,F8",
    oracle=f"""
    SELECT o.o_orderkey AS id,
           n.n_name AS country,
           o.o_orderpriority AS priority,
           o.o_orderdate AS batch_time,
           CASE WHEN t.l_orderkey IS NOT NULL THEN 'Transformed'
                ELSE 'Extracted Only' END AS status
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) t
           ON t.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '{DATE_LO}' AND TIMESTAMP '{DATE_HI}'
    ORDER BY batch_time DESC, id DESC
    LIMIT 1000
    """,
)
def extract_logs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract-stage log table (reference
    `streamlit/etl_logs.py:366-381`): newest-first LIMIT 1000 with a
    next-stage existence probe labeled by CASE WHEN. The probe is a
    LEFT JOIN against the distinct child keys (not a row-multiplying
    join); ordering is tie-broken on (batch_time, id) so the top-1000
    set is deterministic — which also makes the plan
    TakeOrderedAndProject instead of a global sort."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "lineitem"))
    probed = t["lineitem"].select("l_orderkey").distinct()
    return (
        t["orders"]
        .filter(F.col("o_orderdate").between(DATE_LO, f"{DATE_HI} 00:00:00"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(probed, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(F.col("o_orderkey").alias("id"),
                F.col("n_name").alias("country"),
                F.col("o_orderpriority").alias("priority"),
                F.col("o_orderdate").alias("batch_time"),
                F.when(F.col("l_orderkey").isNotNull(), "Transformed")
                 .otherwise("Extracted Only").alias("status"))
        .orderBy(F.col("batch_time").desc(), F.col("id").desc())
        .limit(1000)
    )


@register(
    "transform_logs_table",
    survey="dash-logs,J2,J4,W7,F8",
    oracle=f"""
    SELECT {_LINE_ID_SQL} AS id,
           n.n_name AS country,
           o.o_orderdate AS batch_time,
           l.l_returnflag AS status,
           CASE WHEN l.l_linestatus = 'F' THEN 'Loaded'
                ELSE 'Not Loaded' END AS load_status
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '{DATE_LO}' AND TIMESTAMP '{DATE_HI}'
    ORDER BY batch_time DESC, id DESC
    LIMIT 1000
    """,
)
def transform_logs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform-stage log table (reference
    `streamlit/etl_logs.py:399-420`): each transform row joined back to
    its extract parent and the country dim, labeled with its load-stage
    survival. The load probe needs no join at all in this schema (the
    flag is on the row) — the reference's ll LEFT JOIN collapses to a
    CASE WHEN, which is exactly what a columnar layout buys."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "lineitem"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate").between(DATE_LO, f"{DATE_HI} 00:00:00"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(_line_id().alias("id"),
                F.col("n_name").alias("country"),
                F.col("o_orderdate").alias("batch_time"),
                F.col("l_returnflag").alias("status"),
                F.when(F.col("l_linestatus") == "F", "Loaded")
                 .otherwise("Not Loaded").alias("load_status"))
        .orderBy(F.col("batch_time").desc(), F.col("id").desc())
        .limit(1000)
    )


@register(
    "load_logs_table",
    survey="dash-logs,J3,W7",
    oracle=f"""
    SELECT {_LINE_ID_SQL} AS id,
           n.n_name AS country,
           o.o_orderdate AS batch_time,
           l.l_returnflag AS status
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_linestatus = 'F'
      AND o.o_orderdate BETWEEN TIMESTAMP '{DATE_LO}' AND TIMESTAMP '{DATE_HI}'
    ORDER BY batch_time DESC, id DESC
    LIMIT 1000
    """,
)
def load_logs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-stage log table (reference
    `streamlit/etl_logs.py:433-450`): the 4-way chain from the load
    stage back up to the country dimension, newest first, LIMIT 1000
    tie-broken. The load-stage filter pushes to the lineitem scan
    BELOW the joins, so only finished lines ever enter the chain."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "lineitem"))
    return (
        t["lineitem"]
        .filter(F.col("l_linestatus") == "F")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderdate").between(DATE_LO, f"{DATE_HI} 00:00:00"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(_line_id().alias("id"),
                F.col("n_name").alias("country"),
                F.col("o_orderdate").alias("batch_time"),
                F.col("l_returnflag").alias("status"))
        .orderBy(F.col("batch_time").desc(), F.col("id").desc())
        .limit(1000)
    )
