"""Faceted result counts: per-facet-value match counts for a result set.

Every search UI shows "java (1,204) · python (873) · …" beside the
results. The facet source columns (repo, lang, path prefix — input_hint
shape) live in the CORPUS, not the index, so the shape is: match set from
the index (postings-pruned, corpus untouched) → semi-join the corpus down
to matches → ONE groupBy over the facet columns with map-side partials.
The match-id set broadcasts when small; count distinct facet values is
vocabulary-sized output regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    id_col: str = "docid",
    broadcast_results: bool = True,
) -> DataFrame:
    """→ (*facet_cols, n_docs) for docs of ``docs`` whose ``id_col`` is in
    ``results`` — descending count, then facet values ascending.

    ``broadcast_results`` fits page-sized result sets (no corpus shuffle);
    pass False when faceting a match set a frequent term made huge — the
    semi-join then hash-partitions both sides instead."""
    if not facet_cols:
        raise ValueError("at least one facet column required")
    ids = results.select(id_col).distinct()
    if broadcast_results:
        ids = F.broadcast(ids)
    matched = docs.join(ids, id_col, "semi")
    return (
        matched.groupBy(*facet_cols)
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(c) for c in facet_cols])
    )
