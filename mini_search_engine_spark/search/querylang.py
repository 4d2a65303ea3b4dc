"""Composable boolean query language: ``spark AND (merge OR join) AND NOT
"fast scan"``.

The reference exposes AND and OR only as flat keyword lists
(``InvertedIndexManager.java:934-1094``); every production fulltext engine
layers a composable boolean language over the same postings. This module
adds that layer without new index state: a driver-side recursive-descent
parser builds a tiny AST, and the whole expression is evaluated in ONE
postings scan —

* every term mentioned anywhere in the query (including inside NOT and
  inside phrases) goes into a single int-tid ``In`` pushdown scan;
* per-doc term presence is one ``groupBy(docid).agg(collect_set(tid))``
  (arrays bounded by the query's term count — a handful of longs per doc);
* the boolean expression compiles to a single Catalyst column over that
  presence array (``array_contains`` + ``& | ~``), so AND/OR/NOT nesting
  is whole-stage-codegen'd, not one join per operator;
* the doc universe (``doclens``) joins in ONLY when the expression can be
  true for a doc containing none of the query's terms (e.g. a top-level
  ``NOT x``) — decided driver-side by evaluating the AST with all leaves
  False, so positive queries never pay the O(n_docs) left join;
* quoted phrases are leaves: each computes its docid set via the existing
  positional fold (``search_phrase``) and joins in as a boolean flag.

Cost model at scale: one pruned scan + one hash aggregate on docid,
regardless of how deeply the query nests — the same exchange count as a
flat AND. A term nested arbitrarily deep costs the same as one at top
level.

Semantics (documented, oracle-checked):

* a term analyzes through the index's analyzer; multi-token analysis
  means the tokens are AND'ed (matches ``search_and``'s treatment of a
  keyword that splits);
* a term whose analysis is EMPTY (pure stopword/punctuation) is a
  ``False`` leaf: ``the`` matches nothing, ``NOT the`` matches every
  doc, ``the OR spark`` degrades to ``spark`` — composable, unlike the
  reference's whole-query-empty AND rule (which ``search_and`` keeps
  for parity);
* operator precedence ``NOT > AND > OR``; adjacency is implicit AND
  (``spark merge`` ≡ ``spark AND merge``); operators are matched
  case-insensitively, parens group, ``"..."`` is a positional phrase.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_query
from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.index.termid import term_ids
from mini_search_engine_spark.search.boolean import (
    _empty_docids,
    _postings_for,
    search_phrase,
)


# -- AST ---------------------------------------------------------------------

@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class Phrase:
    text: str


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


_TOKEN_RE = re.compile(r'\(|\)|"[^"]*"|[^\s()"]+')


class QuerySyntaxError(ValueError):
    pass


def parse_query(query: str):
    """Parse the boolean query language into an AST.

    Grammar (precedence NOT > AND > OR, adjacency = implicit AND)::

        or   := and (OR and)*
        and  := not ((AND)? not)*
        not  := NOT not | atom
        atom := '(' or ')' | '"phrase"' | term
    """
    toks = _TOKEN_RE.findall(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def is_op(t, name):
        return t is not None and t.upper() == name

    def p_or():
        parts = [p_and()]
        while is_op(peek(), "OR"):
            take()
            parts.append(p_and())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def p_and():
        parts = [p_not()]
        while True:
            t = peek()
            if is_op(t, "AND"):
                take()
                parts.append(p_not())
            elif t is not None and t != ")" and not is_op(t, "OR"):
                parts.append(p_not())  # implicit AND on adjacency
            else:
                break
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def p_not():
        if is_op(peek(), "NOT"):
            take()
            return Not(p_not())
        return p_atom()

    def p_atom():
        t = peek()
        if t is None:
            raise QuerySyntaxError(f"unexpected end of query: {query!r}")
        if t == "(":
            take()
            inner = p_or()
            if peek() != ")":
                raise QuerySyntaxError(f"unbalanced '(' in {query!r}")
            take()
            return inner
        if t == ")":
            raise QuerySyntaxError(f"unbalanced ')' in {query!r}")
        take()
        if t.startswith('"'):
            return Phrase(t[1:-1])
        if t.upper() in ("AND", "OR", "NOT"):
            raise QuerySyntaxError(f"operator {t!r} needs an operand in {query!r}")
        return Term(t)

    if not toks:
        raise QuerySyntaxError("empty query")
    ast = p_or()
    if pos != len(toks):
        raise QuerySyntaxError(f"trailing tokens {toks[pos:]} in {query!r}")
    return ast


def expand_synonyms(node, synonyms: dict[str, list[str]]):
    """Query-time synonym expansion: rewrite each Term leaf whose
    lowercased text has an entry in ``synonyms`` into an OR group of the
    original + its synonyms. A pure AST→AST rewrite BEFORE compilation, so
    the expanded query still evaluates in one scan (the synonyms simply
    widen the tid pushdown set); phrases are left alone (synonyms inside a
    phrase would change its positional semantics)."""
    if isinstance(node, Term):
        syns = synonyms.get(node.text.lower())
        if syns:
            return Or(tuple([node] + [Term(s) for s in syns]))
        return node
    if isinstance(node, Phrase):
        return node
    if isinstance(node, Not):
        return Not(expand_synonyms(node.child, synonyms))
    if isinstance(node, And):
        return And(tuple(expand_synonyms(c, synonyms) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(expand_synonyms(c, synonyms) for c in node.children))
    raise TypeError(f"unknown AST node {node!r}")


# -- compilation -------------------------------------------------------------

def _walk(node, analyzer: str, terms: set, phrases: list):
    """Collect analyzed leaf terms and phrase leaves (phrases list is
    deduplicated and ordered by first appearance so the per-phrase join
    columns are deterministic)."""
    if isinstance(node, Term):
        terms.update(analyze_query(node.text, analyzer))
    elif isinstance(node, Phrase):
        terms.update(analyze_query(node.text, analyzer))
        if node.text not in phrases:
            phrases.append(node.text)
    elif isinstance(node, Not):
        _walk(node.child, analyzer, terms, phrases)
    elif isinstance(node, (And, Or)):
        for c in node.children:
            _walk(c, analyzer, terms, phrases)


def _compile(node, analyzer: str, phrase_col: dict) -> Column:
    """AST → one Catalyst boolean column over (tids array, phrase flags)."""
    if isinstance(node, Term):
        toks = analyze_query(node.text, analyzer)
        if not toks:
            return F.lit(False)  # stopword-only term: matches nothing
        cols = [
            F.array_contains(F.col("tids"), F.lit(tid))
            for tid in term_ids(sorted(set(toks)))
        ]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out
    if isinstance(node, Phrase):
        return F.coalesce(F.col(phrase_col[node.text]), F.lit(False))
    if isinstance(node, Not):
        return ~_compile(node.child, analyzer, phrase_col)
    if isinstance(node, And):
        out = _compile(node.children[0], analyzer, phrase_col)
        for c in node.children[1:]:
            out = out & _compile(c, analyzer, phrase_col)
        return out
    if isinstance(node, Or):
        out = _compile(node.children[0], analyzer, phrase_col)
        for c in node.children[1:]:
            out = out | _compile(c, analyzer, phrase_col)
        return out
    raise TypeError(f"unknown AST node {node!r}")


def _eval_empty(node, analyzer: str) -> bool:
    """Evaluate the AST for a hypothetical doc containing NO query term
    (every leaf False). True ⇒ the result must include such docs ⇒ the
    doc universe is needed; False ⇒ the presence frame alone suffices."""
    if isinstance(node, (Term, Phrase)):
        return False
    if isinstance(node, Not):
        return not _eval_empty(node.child, analyzer)
    if isinstance(node, And):
        return all(_eval_empty(c, analyzer) for c in node.children)
    if isinstance(node, Or):
        return any(_eval_empty(c, analyzer) for c in node.children)
    raise TypeError(f"unknown AST node {node!r}")


def search_query(
    index: InvertedIndex,
    query: str,
    synonyms: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate a boolean query-language string → docids ascending.

    ``synonyms`` (term → alternatives) OR-expands matching term leaves
    before evaluation (see ``expand_synonyms``). See module docstring for
    the grammar, semantics, and the single-scan / single-aggregate
    evaluation strategy.
    """
    ast = parse_query(query)
    if synonyms:
        ast = expand_synonyms(ast, synonyms)
    terms: set[str] = set()
    phrases: list[str] = []
    _walk(ast, index.analyzer, terms, phrases)
    needs_universe = _eval_empty(ast, index.analyzer)

    if terms:
        presence = (
            _postings_for(index, sorted(terms))
            .select("tid", F.explode("docids").alias("docid"))
            .groupBy("docid")
            .agg(F.collect_set("tid").alias("tids"))
        )
    else:
        presence = _empty_docids(index).withColumn(
            "tids", F.array().cast("array<long>")
        )

    if needs_universe:
        base = (
            index.doclens.select("docid")
            .join(presence, "docid", "left")
            .withColumn(
                "tids", F.coalesce(F.col("tids"), F.array().cast("array<long>"))
            )
        )
    else:
        base = presence

    phrase_col: dict[str, str] = {}
    for i, ph in enumerate(phrases):
        col = f"_ph_{i}"
        phrase_col[ph] = col
        flags = search_phrase(index, ph).withColumn(col, F.lit(True))
        base = base.join(flags, "docid", "left")

    cond = _compile(ast, index.analyzer, phrase_col)
    return base.filter(cond).select("docid").orderBy("docid")
