"""Symbol extraction (ctags-lite) over a source-code corpus.

Code search ranks DEFINITIONS above mere mentions (Zoekt's symbol
ranking; every IDE's "go to definition"): the engine needs a
(docid, symbol) table of declared names. Extraction is one declarative
pass — ``regexp_extract_all`` with a cross-language declaration pattern
(def/fn/func/function/class/interface/enum/struct/trait/object +
identifier) — pure Catalyst, no UDF, no shuffle until the caller
aggregates. The symbols table then composes with the rest of the engine:
exact/prefix lookup, or a per-doc symbol field for
``multi_field_bm25`` (definitions outrank bodies).

At 100 TB: a narrow projection scan per doc; output is Σ defs-per-file
(~10-100×  smaller than tokens). Parquet-partition it by symbol prefix if
point lookups dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# keyword + captured identifier; the SAME regex string runs in Spark
# (Java), DuckDB (RE2) and Python's re for tests/oracles
SYMBOL_DEF_PATTERN = (
    r"(?:def|fn|func|function|class|interface|enum|struct|trait|object)"
    r"\s+([A-Za-z_][A-Za-z0-9_]*)"
)


def extract_symbols(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (docid, symbol): one row per declaration occurrence, in document
    order (duplicates kept — re-declarations are real occurrences;
    ``.distinct()`` is one call away). Case-sensitive, as symbols are."""
    syms = F.regexp_extract_all(
        F.coalesce(F.col(content_col), F.lit("")), F.lit(SYMBOL_DEF_PATTERN), 1
    )
    return docs.select("docid", F.explode(syms).alias("symbol"))


def symbol_search(symbols: DataFrame, name: str) -> DataFrame:
    """Docids declaring ``name`` (exact, case-sensitive) — 'go to
    definition' over the (docid, symbol) table."""
    return (
        symbols.filter(F.col("symbol") == name)
        .select("docid")
        .distinct()
        .orderBy("docid")
    )


def symbol_field(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-doc symbol pseudo-document: (docid, content=joined symbols) —
    ready to ``build_index(analyzer='code')`` as the boosted definitions
    field of a ``multi_field_bm25`` query."""
    return (
        extract_symbols(docs, content_col)
        .groupBy("docid")
        .agg(F.array_join(F.collect_list("symbol"), " ").alias("content"))
    )


# import/include/require/use + dotted identifier — same string for Spark
# (Java), DuckDB (RE2), python-re
IMPORT_PATTERN = r"(?:import|from|include|require|use)\s+([A-Za-z_][A-Za-z0-9_.]*)"
MODULE_PATTERN = r"module\s+([A-Za-z_][A-Za-z0-9_.]*)"


def extract_imports(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (docid, target): every import-statement target in the doc."""
    tgts = F.regexp_extract_all(
        F.coalesce(F.col(content_col), F.lit("")), F.lit(IMPORT_PATTERN), 1
    )
    return docs.select("docid", F.explode(tgts).alias("target"))


def import_edges(
    docs: DataFrame, content_col: str = "content", module_col: str | None = None
) -> DataFrame:
    """→ distinct (src, dst) dependency edges: src imports a name some dst
    DECLARES (its ``module_col`` value, or its first ``module <name>``
    declaration when None).

    One extraction pass each side + ONE equi-join on the module name —
    module names are near-unique so the join is skew-safe; a hub module
    imported by millions of files is fan-IN (many src rows, distinct
    (src,dst) pairs), which shuffles fine — never a bucket explosion."""
    imp = extract_imports(docs, content_col)
    if module_col is None:
        decl = docs.select(
            F.col("docid").alias("dst"),
            F.regexp_extract(
                F.coalesce(F.col(content_col), F.lit("")), MODULE_PATTERN, 1
            ).alias("module"),
        ).filter(F.col("module") != "")
    else:
        decl = docs.select(F.col("docid").alias("dst"), F.col(module_col).alias("module"))
    return (
        imp.join(decl, imp["target"] == decl["module"])
        .select(F.col("docid").alias("src"), "dst")
        .distinct()
    )
