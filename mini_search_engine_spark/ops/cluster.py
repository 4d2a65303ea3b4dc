"""Near-dup clustering: connected components over candidate pairs, and
canonical-document selection.

Pairwise dedup (MinHash-LSH / SimHash / embedding-LSH) yields EDGES;
a keep-one-per-group pipeline needs COMPONENTS — A~B and B~C must retire
A, B, C together even though (A, C) was never emitted as a pair. This
module closes that gap with min-label propagation:

* ``connected_components`` iterates ``label(v) ← min(label(v), min over
  neighbors label(u))`` to a fixed point. Labels are docids, so the final
  label is the smallest docid in the component — a deterministic,
  coordination-free cluster id (no zipWithIndex, no driver state).
* Scale shape: the edge set is |candidate pairs| — orders of magnitude
  smaller than the corpus (only near-dup docs appear). Each iteration is
  one join + one groupBy on the edge frame, both shuffling on docid;
  iterations needed = component diameter, and near-dup components are
  shallow (stars/cliques around a popular document — typically ≤3-4
  hops). Loop invariants are persisted, lineage is truncated with
  ``localCheckpoint`` (same regime as search/pagerank.py), and every
  intermediate cache is released — leak-free like the pagerank loop.
* ``dedup_clusters`` maps EVERY document to its cluster id (singletons
  keep their own docid — one left join against the component labels);
  ``dedup_keep_canonical`` then filters the corpus to the canonical
  (min-docid) member per cluster — the actual 100 TB dedup delete set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.ops.dedup import minhash_candidate_pairs


def connected_components(
    pairs: DataFrame,
    a_col: str = "docid_a",
    b_col: str = "docid_b",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """→ (docid, cluster): one row per node appearing in ``pairs``;
    ``cluster`` = min docid reachable (the component's canonical id).

    Converges when an iteration changes no label; raises if ``max_iter``
    iterations were insufficient (a diameter-``max_iter`` near-dup chain
    means the pair generation itself is degenerate — see
    ``minhash_candidate_pairs(max_bucket=...)``)."""
    spark = pairs.sparkSession
    # undirected: propagate both ways; distinct trims band-duplicate edges
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).persist()
    labels.count()  # materialize (edges materialize through this)

    for it in range(max_iter):
        # each node offers its label to every neighbor; keep the min of
        # (own label, best offer)
        offers = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()  # truncate join lineage
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "_old"), "node")
            .filter(F.col("label") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    edges.unpersist()
    out = labels.select(F.col("node").alias("docid"), F.col("label").alias("cluster"))
    labels.unpersist()
    return out


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    content_col: str = "content",
    **pair_kwargs,
) -> DataFrame:
    """→ (docid, cluster) for EVERY document: near-dup components share
    the min member docid; singletons keep their own docid. ``pairs``
    defaults to MinHash-LSH candidates over ``docs``."""
    if pairs is None:
        pairs = minhash_candidate_pairs(docs, content_col=content_col, **pair_kwargs)
    comp = connected_components(pairs)
    return (
        docs.select("docid")
        .join(comp, "docid", "left")
        .select(
            "docid",
            F.coalesce(F.col("cluster"), F.col("docid")).alias("cluster"),
        )
    )


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    content_col: str = "content",
    **pair_kwargs,
) -> DataFrame:
    """Corpus filtered to one canonical (min-docid) document per near-dup
    cluster — the rows a training pipeline keeps. Everything else is the
    delete set (feed it to ``streaming.delete_docs`` to tombstone an
    already-built index)."""
    clusters = dedup_clusters(docs, pairs, content_col, **pair_kwargs)
    return docs.join(
        clusters.filter(F.col("docid") == F.col("cluster")).select("docid"),
        "docid",
        "semi",
    )
