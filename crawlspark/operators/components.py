"""Distributed connected components + near-dup cluster resolution.

A dedup pipeline does not end at verified similar PAIRS — a training-
data pipeline must resolve the pair graph into duplicate CLUSTERS and
keep one canonical document per cluster (gocrawl's visited-set plays
the same "admit once per equivalence class" role for exact URL
identity; this extends it to near-duplicate content identity, the step
CommonCrawl-scale corpus curation needs).

Algorithm: iterative min-label propagation with one pointer-jumping
hop per round.

* state is a (node, label) relation, label initialised to the node id;
* each round computes ``label'[u] = min(label[u], min over neighbours
  v of label[v])`` (an equi-join on the edge relation + a groupBy min
  — both shuffles on uniformly-hashed ids), then applies one hop of
  pointer jumping ``label''[u] = label'[label'[u]]`` (a self-join),
  which contracts label chains geometrically;
* converged when no label changed (one count per round — O(log n)
  driver round-trips, each a cheap metadata-sized job).

At fixpoint every node's label is ≤ all its neighbours' labels and
labels are idempotent, i.e. label = min node id of the connected
component.  100 TB shape: every step is a key-hashed shuffle on the
node id — no driver-side data, no global sort, and near-dup graphs
are overwhelmingly tiny disjoint cliques, so the label relation stays
the size of the CLUSTERED subset (post-LSH, a small fraction of the
corpus), not the corpus.

Reference seam: gocrawl keeps per-URL identity in its visited map
(crawler.go:33-37); cluster identity generalizes it content-wise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns (node, component) with ``component`` = the minimum node id
    reachable from ``node``.  Nodes appear iff they touch an edge
    (callers union isolated nodes back if needed).

    ``edges`` may list each pair once in either orientation; self-loops
    and duplicates are tolerated (deduped on ingest).
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbour-min: label'[u] = min(label[u], min_{v in N(u)} label[v])
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label").alias("vlab")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlab").alias("nmin"))
        )
        prop = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("mid"),
            )
        )
        # pointer jumping: label''[u] = label'[label'[u]] — contracts
        # label chains geometrically so convergence is ~log(diameter)
        jump = prop.alias("p").join(
            prop.select(
                F.col("node").alias("t"), F.col("mid").alias("tmid")
            ).alias("q"),
            F.col("p.mid") == F.col("q.t"),
            "left",
        ).select(
            F.col("p.node").alias("node"),
            F.col("p.old").alias("old"),
            F.coalesce(F.col("q.tmid"), F.col("p.mid")).alias("label"),
        )
        # one truncated localCheckpoint per round: iterative plans
        # otherwise grow linearly and re-execute from the root
        jump = jump.localCheckpoint()
        changed = jump.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = jump.select("node", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    jaccard_e4_min: int = 3000,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate cluster resolution over a document corpus.

    Pipeline: MinHash/LSH candidate pairs → exact n-gram Jaccard
    verification (``ngram_jaccard``) → keep pairs with Jaccard ≥
    ``jaccard_e4_min`` (e4 quantized) → connected components → one
    keeper per cluster (the minimum doc_id).

    Emits (doc_id, cluster_id, cluster_size, is_keeper) for every
    document that belongs to a ≥2-document cluster; a corpus-dedup job
    drops rows where ``NOT is_keeper``.
    """
    from crawlspark.operators.textops import ngram_jaccard

    pairs = ngram_jaccard(
        docs, text_col=text_col, shingle_n=shingle_n
    ).filter(F.col("jaccard_e4") >= jaccard_e4_min)
    comp = connected_components(pairs, "a_id", "b_id")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_keeper"),
        )
    )
