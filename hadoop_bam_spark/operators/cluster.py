"""Near-duplicate cluster resolution: connected components over candidate
pairs, and canonical-document selection.

A pair generator (minhash LSH, simhash, embedding cosine) emits EDGES; a
real dedup pipeline must then group transitively-linked documents into one
cluster and keep a single canonical member (A~B and B~C must collapse to
one cluster even if A~C was never emitted as a pair).

The component algorithm is iterative min-label propagation expressed as
DataFrame joins: each node adopts the smallest label among itself and its
neighbors until a fixpoint. Iterations are O(component diameter), which for
duplicate clusters is tiny (duplicates of one source document form a
near-clique). Each round is one equi-join + one groupBy — both
hash-partitioned on node id, no skew beyond the natural cluster sizes — and
the per-round result is ``localCheckpoint``-ed so the plan does not grow
with the iteration count (the standard Spark pattern for iterative graph
algorithms; for adversarial long-chain graphs swap in the
large-star/small-star contraction, which converges in O(log n) rounds with
the same join-shaped rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id_a, id_b) edge list -> (doc_id, cluster_id) membership.

    ``cluster_id`` is the minimum node id in the component, so output is
    deterministic. Only nodes that appear in at least one edge are returned
    (singletons are by definition not duplicates). Converges when a full
    round changes no label; the monotone non-increasing label sum makes the
    check one cheap aggregate per round.
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iterations):
        neighbor = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        labels = (
            labels.union(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster.

    The canonical document is the cluster's minimum id. Implemented as a
    LEFT ANTI join of the corpus against the non-canonical membership — one
    broadcast-able (membership << corpus) join, no corpus shuffle.
    """
    members = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = members.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(
        F.broadcast(losers), df[id_col] == losers["doc_id"], "left_anti"
    )
