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


@register("semantic_dedup", survey="LLM-dedup,U2,J1")
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-compare near-dup removal: IVF-cell assignment
    (narrow literal-codebook map), then per-cell greedy cosine dedup
    in one applyInPandas group per cell — keep the lowest vec_id of
    every duplicate group, emit (vec_id, cell, keep, dup_of). Rows-only
    driver check (depends on the trained codebook); planted-cluster
    behavior, determinism, and the keep-set's pairwise-dissimilarity
    invariant are pinned in tests/test_semdedup.py."""
    rows = ensure_ivf_codebook(spark, sf_dir)
    t = load_tables(spark, sf_dir, ("embeddings",))
    assigned = assign_cells_literal(_vecs(t["embeddings"]), rows)

    def dedup_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        n = len(pdf)
        keep: list[int] = []          # row indices kept so far
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(n):
            if keep:
                sims = M[keep] @ M[i]
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
