"""Near-duplicate clustering: candidate pairs → connected components →
one canonical doc per cluster — the step every production dedup
pipeline runs after pair mining (minhash/simhash/embedding pairs say
"these two match"; the corpus needs "keep THIS one, drop those").

Beyond-reference operator family (the reference moves tabular parquet
only); part of the LLM-data-pipeline suite the task brief demands.

Spark-first realization: iterative MIN-LABEL PROPAGATION on plain
DataFrames — no GraphFrames/graph library. State is one (node, lbl)
table; each round does

    lbl(n) ← min(lbl(n), min over neighbors m of lbl(m))

as one equi-join (edges ⨝ labels on src) + one groupBy(dst) min + one
left join back — all hash-partitioned on the node id, so successive
rounds reuse the same partitioning. Rounds needed = component diameter;
near-dup clusters are short-diameter stars/cliques (a pair-verified
duplicate of A and of B is near both), so convergence is typically 2-3
rounds. ``localCheckpoint`` truncates lineage each round — plans stay
flat however many rounds run.

100 TB posture: the loop's shuffles are all on the node id; the edge
table is the candidate-pair output (already bucketed by the LSH
machinery upstream, orders of magnitude smaller than the corpus).
If diameters ever grew (chained plagiarism), the alternating
large-star/small-star variant of the same DataFrame loop halves round
count; the state shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the component's minimum node id (deterministic,
    engine-independent labeling). Converges early when a round changes
    nothing; ``max_iters`` bounds pathological chains."""
    sym = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.coalesce("nlbl", "lbl") < F.col("lbl")).alias("__chg"),
            )
            .localCheckpoint()  # eager: materialized once, read twice below
        )
        changed = updated.filter(F.col("__chg")).count()
        labels = updated.select("node", "lbl")
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def dedup_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Corpus-wide dedup verdict: (doc_id, cluster_id, is_canonical).
    Every doc gets a cluster — singletons are their own cluster — and
    exactly one doc per cluster (the minimum id) is canonical; a
    keep-canonical filter is the production "drop duplicates" step."""
    comp = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "node", id_col
    )
    return (
        docs.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col))
            .cast("boolean")
            .alias("is_canonical"),
        )
    )
