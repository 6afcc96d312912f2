"""ETL-shaped queries over driver testdata (validation routing et al.).

The full bronze→silver→gold pipeline over staged JSON lives in
`etl.pipeline`; these registry entries express its row-routing semantics
over the driver's `events` table so the DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables


@register(
    "validation_routing",
    survey="P8,P11,A3,A5",
    oracle="""
    SELECT route,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) * 100.0 / SUM(COUNT(*)) OVER () AS pct
    FROM (
        SELECT CASE WHEN value IS NULL OR value < 0 OR event_type IS NULL
                    THEN 'quarantine' ELSE 'valid' END AS route
        FROM events
    ) GROUP BY route
    """,
)
def validation_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-branch validation routing (reference corrupt-record handling
    `etl/transformer.py:59-74`: bad rows → error zone, good → processed)
    expressed as a CASE-labeled single scan + rate rollup — the
    valid/quarantine split without reading the data twice, fully lazy."""
    t = load_tables(spark, sf_dir, ("events",))
    routed = t["events"].select(
        F.when(F.col("value").isNull() | (F.col("value") < 0)
               | F.col("event_type").isNull(), "quarantine")
        .otherwise("valid").alias("route"))
    counts = routed.groupBy("route").agg(F.count("*").alias("n"))
    # total via broadcast of a 1-row aggregate, not a global window —
    # the per-route frame is tiny but plan hygiene is free
    total = counts.agg(F.sum("n").alias("tot"))
    return (counts.crossJoin(F.broadcast(total))
            .select("route", "n",
                    (F.col("n").cast("double") * 100.0 / F.col("tot"))
                    .alias("pct")))
