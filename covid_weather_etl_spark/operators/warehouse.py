"""Warehouse-maintenance operators: incremental aggregate refresh and
space-filling-curve data layout.

The reference maintains its warehouse with a batch cursor and in-place
upserts (`dags/etl_dag.py:40-46`, `database/operations.py:157-163`) and
recomputes every dashboard aggregate from scratch on each render
(`streamlit/etl_logs.py` re-issues the full GROUP BY per page load).
At 100 TB neither survives: aggregates must be maintained
*incrementally* (merge yesterday's partials with today's delta instead
of rescanning history), and the physical layout must support file
skipping (min/max pruning only works when values are clustered).
These two operators are those scale paths, both oracle-checked:

- ``incremental_agg_maintenance`` — merge-refresh of a monthly revenue
  rollup: partial aggregates over the base (historical) slice merged
  with partials over the delta slice via a full-outer coalesce. The
  oracle is the ONE-SHOT aggregate over everything, so the driver
  verifies the algebraic identity merge(partial(A), partial(B)) ==
  total(A ∪ B) that all mergeable-state maintenance rests on.
- ``zorder_layout`` — Morton (bit-interleaved) clustering of orders on
  (customer-bucket, date-bucket), split into target files, reporting
  per-file min/max of BOTH dimensions. Sorting by one key makes the
  other's min/max spans useless; the Z-curve bounds both, which is what
  makes multi-column predicate skipping work (Delta/Iceberg OPTIMIZE
  ZORDER does exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.functions.numeric import dsum_sql
from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

#: refresh cutoff: rows strictly before it are the "already materialized"
#: base, rows at/after it are the new delta batch being folded in.
CUTOFF = "1997-06-01"


@register(
    "incremental_agg_maintenance",
    survey="ext-mv,A1,A6,A8,F5",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS order_cnt,
           {dsum_sql('o_totalprice')} AS revenue,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the monthly rollup is NOT
    recomputed over all of orders — it is the merge of partial
    aggregates over the pre-cutoff base (what a warehouse would have
    materialized yesterday) with partial aggregates over the post-cutoff
    delta (today's ingest). COUNT merges by +, SUM by + (exact, via
    DECIMAL accumulation), MAX by greatest — all three are commutative
    monoids, so merge(partial, partial) is *identical* to the one-shot
    aggregate, which is exactly what the oracle asserts.

    Scale: the delta scan reads only the new partition; the merge joins
    two month-grained partials (thousands of rows, not billions). This
    turns an O(history) nightly refresh into O(delta) — the only viable
    shape at 100 TB. Spark-side both partials are map-side combinable;
    the outer merge is a tiny shuffle on `month`.
    """
    t = load_tables(spark, sf_dir, ("orders",))
    month = F.date_trunc("month", "o_orderdate").cast("date").alias("month")

    def partial(df: DataFrame) -> DataFrame:
        return (df.select(month, "o_totalprice")
                .groupBy("month")
                .agg(F.count("*").alias("cnt"),
                     F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
                      .alias("rev_dec"),
                     F.max("o_totalprice").alias("mx")))

    base = partial(t["orders"].filter(F.col("o_orderdate") < CUTOFF))
    delta = partial(t["orders"].filter(F.col("o_orderdate") >= CUTOFF))

    b, d = base.alias("b"), delta.alias("d")
    zero = F.lit(0).cast("decimal(25,6)")
    merged = (b.join(d, "month", "full_outer")
              .select(
                  "month",
                  (F.coalesce(F.col("b.cnt"), F.lit(0))
                   + F.coalesce(F.col("d.cnt"), F.lit(0))).alias("order_cnt"),
                  (F.coalesce(F.col("b.rev_dec"), zero)
                   + F.coalesce(F.col("d.rev_dec"), zero))
                  .cast("double").alias("revenue"),
                  F.greatest(F.col("b.mx"), F.col("d.mx")).alias("max_price")))
    return merged


#: Z-order geometry: 8 bits per dimension → 16-bit Morton codes; the
#: top ZFILE_BITS bits of the code name the target file (quad-tree
#: tiling into ZFILES cells).
ZBITS = 8
ZFILE_BITS = 6
ZFILES = 1 << ZFILE_BITS


def _morton_spark(a, b):
    """Interleave the low ZBITS bits of integer columns a (odd bit
    positions) and b (even): pure bit algebra, whole-stage-codegen'd."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        bit_a = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        bit_b = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + bit_a.cast("long") + bit_b.cast("long")
    return z


def _morton_sql(a: str, b: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_CB = "CAST(o_custkey % 256 AS INTEGER)"
_DB = ("CAST(datediff('day', DATE '1992-01-01', "
       "CAST(o_orderdate AS DATE)) % 256 AS INTEGER)")


@register(
    "zorder_layout",
    survey="ext-layout,A6,A8",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey, {_CB} AS cust_bucket, {_DB} AS date_bucket,
               {_morton_sql(_CB, _DB)} AS zval
        FROM orders
    )
    SELECT CAST(zval >> {2 * ZBITS - ZFILE_BITS} AS BIGINT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(cust_bucket) AS min_cust_bucket,
           MAX(cust_bucket) AS max_cust_bucket,
           MIN(date_bucket) AS min_date_bucket,
           MAX(date_bucket) AS max_date_bucket
    FROM keyed
    GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout planning: bucket orders on two
    independent dimensions (customer hash-bucket, order-date day-bucket,
    8 bits each), interleave the bits into a 16-bit Z-value, and assign
    each row to the file named by the Z-value's top {ZFILE_BITS} bits —
    a fixed quad-tree tiling of the (cust, date) plane into {ZFILES}
    cells. The output is each file's min/max envelope on BOTH
    dimensions — the footer stats a lakehouse scan would prune with.
    Clustered this way a predicate on either dimension (or both) skips
    most files; a plain single-column sort only bounds one.

    The Morton code is {ZBITS}×2 shift/mask terms of pure integer
    algebra — whole-stage-codegen'd, no UDF, and the file assignment is
    a pure map-side projection (no global sort or window): at 100 TB
    the physical rewrite is `df.repartitionByRange("zval")` +
    `sortWithinPartitions("zval")` + write, all embarrassingly
    shuffle-parallel. The envelope report is one groupBy on file_id.
    """
    t = load_tables(spark, sf_dir, ("orders",))
    cb = (F.col("o_custkey") % 256).cast("int")
    db = (F.datediff(F.col("o_orderdate").cast("date"),
                     F.to_date(F.lit("1992-01-01"))) % 256).cast("int")
    keyed = t["orders"].select(
        "o_orderkey", cb.alias("cust_bucket"), db.alias("date_bucket"),
        _morton_spark(F.col("o_custkey") % 256,
                      (F.datediff(F.col("o_orderdate").cast("date"),
                                  F.to_date(F.lit("1992-01-01"))) % 256)
                      ).alias("zval"))
    return (keyed
            .withColumn("file_id",
                        F.shiftright("zval", 2 * ZBITS - ZFILE_BITS)
                        .cast("long"))
            .groupBy("file_id")
            .agg(F.count("*").alias("n_rows"),
                 F.min("cust_bucket").alias("min_cust_bucket"),
                 F.max("cust_bucket").alias("max_cust_bucket"),
                 F.min("date_bucket").alias("min_date_bucket"),
                 F.max("date_bucket").alias("max_date_bucket")))
