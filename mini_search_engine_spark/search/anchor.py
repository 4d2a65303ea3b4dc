"""Anchor-text indexing: index the text of inbound links INTO the target
document.

The classic web-ranking signal (how other pages describe a page beats how
it describes itself — the reference ships the link graph for PageRank,
``search/IcsSearchEngine.java``, but never exploits link TEXT). Here each
edge (src → dst) contributes an anchor snippet derived from the source
document; per target, inbound snippets aggregate into an ``anchor`` field
that gets its OWN index (own analyzer/df/avgdl) and combines with the
content field through ``multi_field_bm25`` — the BM25F shape.

Scale shape: deriving snippets is a narrow projection of the corpus; the
aggregation is ONE hash exchange on dst. Hub targets (every web graph has
them) are the skew risk — ``max_anchors`` caps inbound snippets per
target with a window INSIDE the same dst partitioning (row_number then
groupBy reuse one exchange), so a billion-indegree hub costs O(cap), not
O(indegree), in both memory and anchor-field length. Snippet order is
deterministic (ascending src) so the field — and every df/tf statistic
downstream — is reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_texts(
    docs: DataFrame,
    edges: DataFrame,
    n_tokens: int = 3,
    max_anchors: int = 64,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid, anchor_text): per target, the space-joined snippets (first
    ``n_tokens`` whitespace tokens of each linking doc), ordered by source
    docid, capped at ``max_anchors`` inbound links per target."""
    snip = docs.select(
        F.col("docid").alias("src"),
        F.array_join(
            F.slice(
                F.filter(
                    F.split(F.lower(F.col(content_col)), "\\s+"),
                    lambda t: t != F.lit(""),
                ),
                1,
                n_tokens,
            ),
            " ",
        ).alias("snip"),
    )
    w = Window.partitionBy("dst").orderBy("src")
    capped = (
        edges.select("src", "dst")
        .distinct()
        .join(snip, "src")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_anchors)
    )
    return (
        capped.groupBy(F.col("dst").alias("docid"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("src", "snip"))),
                    lambda s: s["snip"],
                ),
                " ",
            ).alias("anchor_text")
        )
    )


def anchor_bm25(
    docs: DataFrame,
    edges: DataFrame,
    keywords: list[str],
    content_weight: float = 1.0,
    anchor_weight: float = 2.0,
    topk: int | None = 10,
    analyzer: str = "punct_nostem",
    n_tokens: int = 3,
    max_anchors: int = 64,
):
    """Content + anchor-field BM25F → (docid, score): the anchor field is
    built from the link graph (``anchor_texts``), indexed separately (its
    own df/avgdl — anchor vocabularies are tiny and repetitive, so sharing
    content statistics would crush anchor idf), and combined as
    ``content_weight·BM25_content + anchor_weight·BM25_anchor``."""
    from mini_search_engine_spark.index.build import build_index
    from mini_search_engine_spark.search.fields import multi_field_bm25

    anchors = anchor_texts(docs, edges, n_tokens, max_anchors).withColumnRenamed(
        "anchor_text", "content"
    )
    content_idx = build_index(docs, analyzer=analyzer)
    anchor_idx = build_index(anchors, analyzer=analyzer)
    return multi_field_bm25(
        [(content_idx, content_weight), (anchor_idx, anchor_weight)],
        keywords,
        topk=topk,
    )
