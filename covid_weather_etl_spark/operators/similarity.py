"""Embedding similarity-search operators (LLM-pipeline extension).

Approximate-nearest-neighbor over the `embeddings` table
(`array<float>` column, 64-dim): brute-force cosine top-k as the
correctness baseline, a windowed k-NN join for batched queries, and an
IVF-style coarse-quantized variant as the 100 TB scale path (search
only the probe's cell instead of the full corpus).

All vector math is expressed with Spark higher-order array functions
(`zip_with` + `aggregate`) — JVM-side, no Python round-trips — in
float64 with sequential accumulation so the DuckDB oracle
(`list_cosine_similarity` on DOUBLE[]) matches bit-for-bit; results
are rounded to 6dp anyway as insurance against formula-order drift.

Scale notes: brute force is O(N·Q) — fine for a broadcast query batch
over a partitioned corpus (each task scans its slice once); the IVF
variant cuts the scanned fraction to ~1/n_cells; at 100 TB you'd also
pre-normalize vectors at write time so cosine degrades to a dot
product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential (deterministic) sum."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _vecs(df: DataFrame) -> DataFrame:
    return df.withColumn("v", F.col("embedding").cast("array<double>"))


@register(
    "cosine_topk",
    survey="LLM-sim,W6",
    bench=True,
    oracle="""
    SELECT b.vec_id,
           b.label,
           ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                        q.embedding::DOUBLE[]), 6) + 0.0 AS cos_sim
    FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE b.vec_id <> 0
    ORDER BY ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                          q.embedding::DOUBLE[]), 6) DESC, b.vec_id
    LIMIT 10
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for one query vector (vec_id=0):
    broadcast the query row, one narrow pass over the corpus, then
    TakeOrderedAndProject — no full sort even at corpus scale."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = _vecs(t["embeddings"])
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sim = F.round(cosine(F.col("v"), F.col("qv")), 6)
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "knn_join",
    survey="LLM-sim,J1,W6",
    oracle="""
    SELECT q_id, vec_id, cos_sim FROM (
        SELECT q.vec_id AS q_id, b.vec_id AS vec_id,
               ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 6) + 0.0 AS cos_sim,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                                         q.embedding::DOUBLE[]), 6) DESC,
                            b.vec_id) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
        JOIN embeddings b ON b.vec_id <> q.vec_id
    ) WHERE rn <= 3
    """,
)
def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN join: top-3 neighbors for each of 5 query vectors
    in ONE plan — broadcast the query batch, score corpus×queries,
    rank per query with a window. The shape of offline retrieval-eval
    jobs (queries ≪ corpus, corpus partitioned)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = _vecs(t["embeddings"])
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv")))
    sim = F.round(cosine(F.col("v"), F.col("qv")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sim.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "ivf_ann_topk",
    survey="LLM-sim,J1,A6",
    oracle="""
    WITH centroids AS (
        SELECT vec_id AS c_id, embedding FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
        SELECT e.vec_id, e.label, e.embedding, c.c_id
        FROM embeddings e JOIN centroids c ON TRUE
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 6) DESC,
                     c.c_id) = 1
    ),
    probe AS (SELECT c_id, embedding FROM assigned WHERE vec_id = 0)
    SELECT a.vec_id, a.c_id AS cell,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        p.embedding::DOUBLE[]), 6) + 0.0 AS cos_sim
    FROM assigned a JOIN probe p ON a.c_id = p.c_id
    WHERE a.vec_id <> 0
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 5
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest of 8
    deterministic centroids (vectors 0..7 stand in for a trained
    codebook), then search ONLY the probe's cell. The scale path:
    assignment is one broadcast pass, and the query touches ~1/8 of
    the corpus; cells map to partitions at 100 TB."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = _vecs(t["embeddings"])
    centroids = (emb.filter(F.col("vec_id") < 8)
                 .select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv")))
    sim_c = F.round(cosine(F.col("v"), F.col("cv")), 6)
    w = W.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("c_id"))
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "label", "v", "c_id", sim_c.alias("c_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "v", "c_id"))
    probe = (assigned.filter(F.col("vec_id") == 0)
             .select(F.col("c_id").alias("p_cell"), F.col("v").alias("pv")))
    sim_p = F.round(cosine(F.col("v"), F.col("pv")), 6)
    return (
        assigned.join(F.broadcast(probe), F.col("c_id") == F.col("p_cell"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("c_id").alias("cell"), sim_p.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )
