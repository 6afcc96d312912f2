"""Graph analytics over the purchase network: weighted PageRank.

Together with the min-label-propagation connected components in
operators/corpus.py (dedup_clusters), this gives the engine the two
canonical iterative-graph primitives. The graph is the bipartite
purchase network — customer ↔ supplier edges weighted by how many
lineitems connect them (orders ⋈ lineitem) — and the query ranks
suppliers by damped random-walk mass, i.e. "which suppliers sit under
the most well-connected demand".

Spark-first iteration shape (the Pregel-without-Pregel pattern):
ranks are a (node, rank) frame; one PageRank round is
edges ⋈ ranks on src → groupBy dst → weighted sum → teleport blend —
two key-projected shuffles per round, a fixed round count, and each
round's frame cached + previous unpersisted so executor storage stays
O(1) rounds deep (the lesson from round 2's ADVICE on cache lifetime).

Determinism: per-destination contributions are summed in DECIMAL
(exact, order-independent) — a double sum here would make ranks (and
the resulting ordering) partitioning-dependent, which would break both
the pytest oracle and cross-run reproducibility at scale.

Scale notes (100 TB): each round's join shuffles only (node, rank) and
(src, dst, frac) — key-projected; out-degree normalization is computed
once. At web scale you add: edge frame bucketed by src (co-located
join across all rounds), localCheckpoint every few rounds to truncate
lineage, and convergence-delta early exit (here: fixed 10 rounds, the
common production choice for stable top-k)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid_weather_etl_spark.queries.registry import register
from covid_weather_etl_spark.sources.catalog import load_tables

DAMPING = 0.85
PR_ROUNDS = 10
_DEC = "decimal(38,30)"  # exact accumulator for rank mass (ranks ≤ 1)


def purchase_edges(t: dict) -> DataFrame:
    """Undirected bipartite edges customer↔supplier with lineitem
    multiplicity as weight, emitted in both directions for the random
    walk. Node ids are prefixed ('c:'/'s:') to keep the two key spaces
    disjoint in one column."""
    pairs = (t["lineitem"]
             .join(t["orders"],
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy(F.concat(F.lit("c:"), F.col("o_custkey")).alias("cust"),
                      F.concat(F.lit("s:"), F.col("l_suppkey")).alias("supp"))
             .agg(F.count("*").alias("w")))
    fwd = pairs.select(F.col("cust").alias("src"),
                       F.col("supp").alias("dst"), "w")
    rev = pairs.select(F.col("supp").alias("src"),
                       F.col("cust").alias("dst"), "w")
    return fwd.unionAll(rev)


def pagerank(edges: DataFrame, rounds: int = PR_ROUNDS,
             damping: float = DAMPING) -> DataFrame:
    """Fixed-round weighted PageRank. Every node appears as a src (the
    bipartite graph is symmetric), so there are no dangling nodes and
    rank mass is conserved each round (pinned in tests)."""
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = (edges.join(outdeg, "src")
         .select("src", "dst", (F.col("w") / F.col("outw")).alias("frac"))
         .cache())
    nodes = e.select(F.col("src").alias("node")).distinct().cache()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(rounds):
        contrib = (e.join(ranks, F.col("src") == F.col("node"))
                   .groupBy("dst")
                   .agg(F.sum((F.col("frac") * F.col("rank")).cast(_DEC))
                        .cast("double").alias("mass")))
        ranks = (nodes.join(contrib, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * F.coalesce("mass", F.lit(0.0)))
                         .alias("rank"))
                 # truncate lineage every round: without this the plan
                 # nests one join level per round and analyzer/codegen
                 # memory grows superlinearly (observed OOM at 10
                 # rounds) — the same reason web-scale PageRank
                 # checkpoints. localCheckpoint materializes the ~N-row
                 # rank frame on executors and resets the plan to a
                 # leaf.
                 .localCheckpoint(eager=True))
    e.unpersist()
    nodes.unpersist()
    return ranks


@register("pagerank_suppliers", survey="ext-graph,J1,A6,U2")
def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier ranking by damped random-walk mass over the purchase
    network (10 rounds, d=0.85, decimal-exact accumulation). Rows-only
    driver check (iterative fixpoint is not ANSI-SQL-expressible);
    tests/test_graph.py pins rank-mass conservation, parity with a
    numpy power iteration on the same adjacency, and determinism."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    ranks = pagerank(purchase_edges(t))
    supp = (ranks.filter(F.col("node").startswith("s:"))
            .select(F.substring("node", 3, 20).cast("bigint")
                    .alias("suppkey"),
                    F.round("rank", 9).alias("rank")))
    return (supp.join(F.broadcast(t["supplier"]),
                      F.col("suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey"), F.col("s_name"), F.col("rank"))
            .orderBy(F.col("rank").desc(), F.col("s_suppkey")))
