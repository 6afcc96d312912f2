"""SemDeDup: semantic deduplication via cluster-then-compare
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

Composes two pieces the engine already has: the trained IVF codebook
(operators/similarity.py train-once seam) assigns every embedding to a
semantic cluster with a narrow literal-codebook map, then pairwise
cosine runs ONLY within each cluster — the quadratic comparison is
bounded by the largest cell, never the corpus. Greedy representative
selection keeps the lowest vec_id of each duplicate group (ascending
scan: a vector is dropped iff it matches an already-kept earlier
vector), which is deterministic and order-independent of partitioning
because each cell is processed as one applyInPandas group.

Scale notes (100 TB): cells are the unit of work — more clusters ⇒
smaller cells ⇒ less quadratic work per task (k_cells is the knob, as
in the paper). A cell too large for one task is re-split by a second
hash of the vector (sub-blocking, same as embedding_near_dup). The
codebook is a persisted model artifact; assignment is a narrow map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.operators.similarity import (
    _vecs, assign_cells_literal, ensure_ivf_codebook,
)
from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

SEM_TAU = 0.5  # driver-corpus demo threshold (max observed cos ≈ 0.6)
#: cosine quantization grid (the rp_lsh / pca quantize-first trade):
#: vectors land on the 1e-6 integer grid, so every pairwise cosine is
#: exact-int dot / (sqrt · sqrt · ÷) — four correctly-rounded IEEE ops
#: from exact integers, bit-identical on any engine. At the corpus's
#: |x| ≤ 0.58 the integer dots stay under 2^53, so even a
#: double-accumulated replay is exact regardless of summation order.
SEM_Q = 1_000_000


def _sem_oracle() -> str:
    """DuckDB replay of the FULL greedy chain over the persisted
    sf0.01 codebook: identical cell assignment, identical quantized
    cosines, and a recursive CTE that admits one vector per cell per
    step in vec_id order — keep iff max cosine to the cell's already-
    kept set is ≤ SEM_TAU, else point at the argmax keeper (ties to
    the lowest kept vec_id, numpy-argmax-first semantics)."""
    from covid_weather_etl_spark.operators.similarity import (
        ivf_codebook_path)
    path = ivf_codebook_path("/root/testdata/sf0.01")
    return f"""
    WITH RECURSIVE cb AS (
        SELECT c_id, cv FROM read_parquet('{path}/*.parquet')
    ),
    qv AS MATERIALIZED (
        SELECT e.vec_id,
               list_transform(e.embedding::DOUBLE[],
                   x -> CAST(FLOOR(x * {SEM_Q} + 0.5) AS BIGINT)) AS q,
               (SELECT c.c_id FROM cb c
                ORDER BY ROUND(list_cosine_similarity(
                             e.embedding::DOUBLE[], c.cv), 6) DESC,
                         c.c_id
                LIMIT 1) AS cell
        FROM embeddings e
    ),
    qn AS MATERIALIZED (
        SELECT vec_id, cell, q,
               sqrt(CAST(list_sum(list_transform(q, x -> x * x))
                         AS DOUBLE)) AS nrm,
               ROW_NUMBER() OVER (PARTITION BY cell
                                  ORDER BY vec_id) AS rn
        FROM qv
    ),
    st(rnd, vec_id, cell, keep, dup_of) AS (
        SELECT 1::BIGINT, vec_id, cell, true, CAST(-1 AS BIGINT)
        FROM qn WHERE rn = 1
        UNION ALL
        (WITH cur AS (SELECT * FROM st),
         t AS (SELECT MAX(rnd) AS tt FROM cur),
         best AS (
            SELECT n.vec_id, n.cell,
                   k.vec_id AS kept_id,
                   list_dot_product(n.q, kn.q)
                       / (n.nrm * kn.nrm) AS sim
            FROM qn n
            JOIN t ON n.rn = t.tt + 1
            JOIN cur k ON k.cell = n.cell AND k.keep
            JOIN qn kn ON kn.vec_id = k.vec_id
         ),
         verdict AS (
            SELECT vec_id, cell, MAX(sim) AS mx FROM best
            GROUP BY vec_id, cell
         ),
         arg AS (
            SELECT b.vec_id, MIN(b.kept_id) AS arg_kept
            FROM best b JOIN verdict v
              ON v.vec_id = b.vec_id AND b.sim = v.mx
            GROUP BY b.vec_id
         ),
         admitted AS (
            SELECT t.tt + 1 AS rnd, n.vec_id, n.cell,
                   (v.mx IS NULL OR v.mx <= 5e-1) AS keep,
                   CASE WHEN v.mx IS NOT NULL AND v.mx > 5e-1
                        THEN a.arg_kept ELSE CAST(-1 AS BIGINT)
                   END AS dup_of
            FROM qn n
            JOIN t ON n.rn = t.tt + 1
            LEFT JOIN verdict v
              ON v.vec_id = n.vec_id AND v.cell = n.cell
            LEFT JOIN arg a ON a.vec_id = n.vec_id
         )
         SELECT rnd, vec_id, cell, keep, dup_of FROM admitted
         UNION ALL
         SELECT t.tt + 1, c.vec_id, c.cell, c.keep, c.dup_of
         FROM cur c, t
         WHERE EXISTS (SELECT 1 FROM qn, t WHERE qn.rn = t.tt + 1)
        )
    )
    SELECT vec_id, CAST(cell AS INT) AS cell, keep, dup_of
    FROM st s
    WHERE rnd = (SELECT MAX(rnd) FROM st)
    """


@register("semantic_dedup", survey="LLM-dedup,U2,J1",
          oracle=_sem_oracle, tags=("oracle-at-sf0.01",))
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-compare near-dup removal: IVF-cell assignment
    (narrow literal-codebook map), then per-cell greedy cosine dedup
    in one applyInPandas group per cell — keep the lowest vec_id of
    every duplicate group, emit (vec_id, cell, keep, dup_of).

    Graduated from rows-only in r8 (the last greedy chain in the
    registry): cosines run on the SEM_Q integer grid — exact int64
    dots, then sqrt/÷ (correctly-rounded IEEE, identical bits on both
    engines) — so every keep/drop decision of the sequential chain is
    deterministic cross-engine and the DuckDB twin replays the WHOLE
    greedy scan as a recursive CTE (one admission per cell per step),
    the cascade risk PARITY.md §11 documented now structurally gone.
    Planted-cluster behavior, determinism, and the keep-set's
    pairwise-dissimilarity invariant stay pinned in
    tests/test_semdedup.py."""
    rows = ensure_ivf_codebook(spark, sf_dir)
    t = load_tables(spark, sf_dir, ("embeddings",))
    assigned = assign_cells_literal(_vecs(t["embeddings"]), rows)

    def dedup_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        Q = np.floor(X * SEM_Q + 0.5).astype("int64")
        nrm = np.sqrt((Q * Q).sum(axis=1).astype("float64"))
        n = len(pdf)
        keep: list[int] = []          # row indices kept so far
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(n):
            if keep:
                # exact int64 dots -> float64 (exact under 2^53 on the
                # real corpus), one divide per kept vector: the same
                # four-op IEEE chain the SQL replay executes
                dots = (Q[keep] @ Q[i]).astype("float64")
                sims = dots / (nrm[keep] * nrm[i])
                j = int(np.argmax(sims))
                if sims[j] > SEM_TAU:
                    dup_of[i] = pdf["vec_id"].iloc[keep[j]]
                    continue
            keep.append(i)
        return pd.DataFrame({
            "vec_id": pdf["vec_id"],
            "cell": int(key[0]),
            "keep": dup_of < 0,
            "dup_of": dup_of,
        })

    return (assigned.groupBy("c_id")
            .applyInPandas(dedup_cell,
                           schema="vec_id long, cell int, keep boolean, "
                                  "dup_of long"))
