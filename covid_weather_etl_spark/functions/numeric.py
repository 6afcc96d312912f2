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


def fround(col: Column, scale: int = 6) -> Column:
    """Cross-engine-deterministic round: ``floor(x·10^s + 0.5) / 10^s``.

    Native ROUND differs between engines at ties: Spark rounds the
    double's shortest decimal representation half-up (Scala BigDecimal),
    DuckDB rounds in binary — a value whose repr ends in "…5" can round
    differently even from bit-identical inputs. This formulation is
    three IEEE ops both engines execute identically, so bit-identical
    inputs give bit-identical outputs, always. (Spark's FLOOR returns
    LONG, so |x·10^s| must stay under 2^63 — true for every stat here.)
    """
    p = float(10 ** scale)
    return F.floor(col * p + F.lit(0.5)) / F.lit(p)


def fround_sql(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of ``fround``."""
    p = float(10 ** scale)
    return f"FLOOR(({expr}) * {p!r} + 0.5) / {p!r}"


# ---------------------------------------------------------------------------
# shared-term-order linear algebra (cross-engine Cramer solves)
# ---------------------------------------------------------------------------

def signed_perms(n: int) -> list[tuple[int, tuple[int, ...]]]:
    """Permutations of range(n) in LEXICOGRAPHIC order with parity
    sign — the shared Leibniz-determinant term order both engines
    replay (Python value twin + generated SQL text)."""
    import itertools
    out = []
    for perm in itertools.permutations(range(n)):
        inv = sum(1 for a in range(n) for b in range(a + 1, n)
                  if perm[a] > perm[b])
        out.append((1 if inv % 2 == 0 else -1, perm))
    return out


def det_val(M: list[list[float]]) -> float:
    """Leibniz determinant, terms in signed_perms order, products and
    the sum strictly left-to-right — the exact op sequence det_sql
    emits, so both engines produce the identical double."""
    n = len(M)
    acc = 0.0
    for sign, perm in signed_perms(n):
        term = M[0][perm[0]]
        for i in range(1, n):
            term = term * M[i][perm[i]]
        acc = acc + term if sign > 0 else acc - term
    return acc


def det_sql(M: list[list[str]]) -> str:
    """SQL text twin of det_val: same term order, left-associative
    products (a * b * c), left-associative signed sum. The emitted
    text parses identically in Spark SQL and DuckDB (only * + - and
    parentheses), so it can run on BOTH engines."""
    parts = []
    for sign, perm in signed_perms(len(M)):
        term = " * ".join(M[i][perm[i]] for i in range(len(M)))
        parts.append(("+ " if sign > 0 else "- ") + "(" + term + ")")
    body = " ".join(parts)
    return "(" + (body[2:] if body.startswith("+ ") else body) + ")"


def cramer_sql(A: list[list[str]], b: list[str], k: int) -> str:
    """x_k of A·x = b via Cramer's rule as shared SQL text: the k-th
    column of A replaced by b, both determinants in det_sql term
    order."""
    Ab = [[b[r] if c == k else A[r][c] for c in range(len(A))]
          for r in range(len(A))]
    return f"({det_sql(Ab)} / {det_sql(A)})"
