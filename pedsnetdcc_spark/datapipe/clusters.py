"""Connected components over a near-duplicate pair graph → dedup
clusters with canonical representatives.

Near-dup detection (MinHash/SimHash/Jaccard/embedding) emits PAIRS; a
dedup pipeline needs GROUPS — the transitive closure — so that "keep
one document per cluster" is well defined even when A~B and B~C but A
and C were never compared.  (Reference scope note: the reference engine
has no graph step; this is part of the training-data extension surface,
like the pair generators in dedup.py.)

Algorithm: minimum-label propagation.  Every node starts labeled with
its own id; each round, every node takes the min of its own label and
its neighbors' labels; fixpoint = components.  Rounds needed = graph
diameter, and near-dup graphs are short-diameter by construction
(clusters are quasi-cliques of mutually-similar documents), so the loop
converges in a handful of rounds.  For adversarial long-chain graphs
the literature's alternating large-star/small-star rounds (Kiveris et
al., "Connected Components in MapReduce and Beyond") bound rounds at
O(log n); the simple propagation is preferred here because the dedup
graphs it serves never exhibit those chains and each round is one
join + one aggregate.

Scale shape per round: one shuffle join (labels ⋈ edges on node) + one
hash aggregate (min label per node).  Lineage is truncated every round
with ``localCheckpoint`` — iterative DataFrame loops otherwise build an
exponentially deep plan that stalls the optimizer long before the data
hurts.  Convergence is detected with a single count of changed labels
per round (an action per round is inherent to any driver-coordinated
fixpoint; the per-round data is two slim columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected pair graph: ``(node, component)``
    with ``component`` = min node id reachable from ``node``.  Only
    nodes appearing in ``pairs`` are returned (isolated documents are
    their own cluster — join back with a coalesce, see
    :func:`assign_clusters`).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        msgs = (
            edges.join(labels.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological chain graph; raise max_iter or switch to "
        "large-star/small-star rounds"
    )


def assign_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    cluster_col: str = "cluster_id",
    max_iter: int = 25,
) -> DataFrame:
    """Every row of ``df`` labeled with its dedup cluster id: the min
    id of its connected component in the pair graph, or its own id when
    it appears in no pair.  ``keep = (id == cluster_id)`` then selects
    one canonical document per cluster."""
    comp = connected_components(pairs, src, dst, max_iter).withColumnRenamed(
        "node", id_col
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn(cluster_col, F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
