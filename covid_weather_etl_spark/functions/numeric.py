"""Numeric helpers that make float aggregates oracle-deterministic.

Summing doubles is order-dependent (IEEE addition is not associative);
Spark's shuffle order and DuckDB's parallel aggregation order differ, so
a naive SUM(double) can differ in the last bits between the engine and
its oracle. Two strategies, mirrored exactly in the oracle SQL:

- ``dsum``: route the sum through DECIMAL. Decimal addition is exact and
  associative, so the total is bit-identical no matter the order; the
  final cast back to DOUBLE is a single deterministic rounding. Right
  for money-like columns (2-decimal data) and any bounded-scale values.
- ``exact_avg``: avg as exact-sum / count — one deterministic division —
  instead of the engines' internal running-mean accumulators.
- ``r6``: round to 6 decimals, for genuinely order-dependent statistics
  (stddev, interpolated percentiles, windowed means over long frames)
  where last-ulp noise is unavoidable; 6 decimals is far above the noise
  floor and far below data resolution.

Scale note: DECIMAL(25,6) sums hold ~10^19 — at 100 TB (~10^11 rows of
~10^5-magnitude values) this still fits with headroom, and decimal
aggregation stays map-side combinable (partial sums are exact too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal type used for exact accumulation; mirrored in oracle SQL text.
DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact order-independent sum of a double column via DECIMAL."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """Oracle-side twin of ``dsum``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def exact_avg_sql(expr: str) -> str:
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"
            f" / COUNT({expr})")


def r6(col: Column, alias: str | None = None) -> Column:
    """Round to 6 decimals — tolerance band for order-dependent float stats."""
    out = F.round(col, 6)
    return out.alias(alias) if alias else out
