"""Shared text-shingling kernels.

One guarded n-gram shingle builder for every Jaccard / containment /
cluster operator, so the short-document guard exists in exactly one
place (advice r8: copies of the bare transform kept widening the
exposure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingled_rows(df: DataFrame, *extra: str, n: int = 3) -> DataFrame:
    """``doc_id`` [+ ``extra`` cols] + exploded DISTINCT n-gram word
    shingles as ``s``, from a frame with ``doc_id``/``text`` columns.

    - Splits ONCE into a column: an inline split(text) inside the
      transform lambda re-tokenizes the document per shingle
      (quadratic in doc length; measured ~1.7x slower).
    - Guards ``size(tk) >= n`` BEFORE the transform: Spark's
      sequence(0, -1) is the DESCENDING [0, -1] (not empty), so an
      (n-1)-token doc would throw inside slice() and shorter docs
      would emit malformed shingles — while the DuckDB oracles'
      generate_series(1, len - n + 1) is simply empty. The guard IS
      the cross-engine semantic for short docs, not an optimization.

    Callers that consume the result multiple times should
    localCheckpoint it themselves (lifetime differs per query).
    """
    cols = ["doc_id", *extra]
    return (df.select(*cols, F.split("text", " ").alias("tk"))
              .filter(F.size("tk") >= n)
              .select(*cols, F.explode(F.expr(
                  f"transform(sequence(0, size(tk) - {n}), "
                  f"i -> concat_ws(' ', slice(tk, i + 1, {n})))")).alias("s"))
              .distinct())
