"""Distributed connected components by min-label propagation — the shared
engine behind neardup_clusters (queries/llm3.py) and the curation
pipeline's cluster stage (pipelines/curation.py).

Plain neighbor-min propagation advances the minimum label ONE hop per
iteration, so it converges in O(graph diameter) iterations — not
log(diameter); the log-round variants (large-star/small-star, alternating
pointer-jumping) exist for adversarially long chains but cost extra
shuffles per round. Near-dup graphs are overwhelmingly star/clique-shaped
(copies of a template all pair with each other), so diameter is small in
practice; the iteration bound is a guardrail and overrunning it RAISES
instead of silently returning half-merged clusters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def min_label_propagation(
    ids: DataFrame, pairs: DataFrame, max_iters: int = 64
) -> DataFrame:
    """(doc_id) x (doc_a, doc_b) -> (doc_id, cluster_id) where cluster_id
    is the minimum doc_id in the connected component.

    Per iteration: one join + partial-min aggregate; lineage truncated
    with localCheckpoint so plan size stays constant; convergence is a
    control-plane count over the cached result (no data to the driver).
    Raises RuntimeError if ``max_iters`` rounds don't converge — a graph
    with diameter that deep needs the pointer-jumping variant, and a
    silently wrong clustering is worse than a loud failure."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.localCheckpoint()  # pair generation runs once, not per iter

    labels = ids.select("doc_id", F.col("doc_id").alias("cluster_id")).localCheckpoint()
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("n_doc"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the old label through the checkpoint so convergence is a
        # filter-count over the cached result — no extra join per iteration
        cand = (
            labels.join(neigh, labels.doc_id == neigh.n_doc, "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("old_label"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = cand.filter(F.col("cluster_id") < F.col("old_label")).count()
        labels = cand.select("doc_id", "cluster_id")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"min-label propagation did not converge in {max_iters} iterations "
        "(graph diameter exceeds the bound); raise max_iters or use a "
        "pointer-jumping variant"
    )
