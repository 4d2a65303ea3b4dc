"""Fixtures ported verbatim from the reference's own test suite, asserting
the same expected results (docids 0..n in insertion order).

Sources: Team10MergeTest.java:25-59 (naive analyzer, merged postings map),
Team11PhraseSearchTest.java:23-120 (porter analyzer, phrase queries),
Team6AndSearchTest-style AND-miss semantics.
"""

import pytest

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.index.merge import merge_segments
from mini_search_engine_spark.search import search_and, search_phrase


def _corpus(spark, texts):
    rows = [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)]
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )


TEAM10_DOCS = [
    "what is he doing today",
    "what a cute dog",
    "i saw you doing there today",
    "a dog is there",
]

# Team10MergeTest.java:36-47 — expected merged Map<term, [docids]>
TEAM10_EXPECTED = {
    "what": [0, 1],
    "is": [0, 3],
    "he": [0],
    "doing": [0, 2],
    "today": [0, 2],
    "a": [1, 3],
    "cute": [1],
    "dog": [1, 3],
    "i": [2],
    "saw": [2],
    "you": [2],
    "there": [2, 3],
}


def test_team10_merge_golden(spark):
    docs = _corpus(spark, TEAM10_DOCS)
    # two "segments" of 2 docs each (flush pattern), rebased merge
    seg0 = build_index(_corpus(spark, TEAM10_DOCS[:2]), analyzer="naive", block_span=4)
    seg1 = build_index(_corpus(spark, TEAM10_DOCS[2:]), analyzer="naive", block_span=4)
    merged = merge_segments([seg0, seg1], rebase_docids=True)
    from conftest import postings_with_term

    got = {}
    for r in postings_with_term(merged).collect():
        got.setdefault(r["term"], []).extend(r["docids"])
    got = {t: sorted(v) for t, v in got.items()}
    assert got == TEAM10_EXPECTED
    # and the direct (global-docid) build agrees
    full = build_index(docs, analyzer="naive", block_span=4)
    got2 = {}
    for r in postings_with_term(full).collect():
        got2.setdefault(r["term"], []).extend(r["docids"])
    assert {t: sorted(v) for t, v in got2.items()} == TEAM10_EXPECTED


TEAM11_DOCS = [
    "That sounds like a good idea. Maybe we should go out to eat beforehand.",
    "Let’s meet at Summer Pizza House. I have not gone there for a long time.",
    "Good idea again. I heard they just came up with a new pizza.",
    "We can meet at Summer Pizza House at noon. That will give us plenty of time to enjoy our pizza.",
    "She graduated last June, and she will start her teaching career next week when the new school term begins.",
    "The kids might even look forward to going to school since they have so many friends to play with.",
    "I am always amazed by the things kindergarten teachers do so it's a good idea to let her join us.",
]


@pytest.fixture(scope="module")
def team11_index(spark):
    return build_index(
        _corpus(spark, TEAM11_DOCS), analyzer="porter", positional=True, block_span=4
    )


def test_team11_phrase1(team11_index):
    # Team11PhraseSearchTest.java:73-84 — ["eat", "beforehand"] → doc 0
    got = [r["docid"] for r in search_phrase(team11_index, "eat beforehand").collect()]
    assert got == [0]


def test_team11_phrase2(team11_index):
    # :90-103 — ["Summer", "Pizza", "House"] → docs 1 and 3
    got = [r["docid"] for r in search_phrase(team11_index, "Summer Pizza House").collect()]
    assert got == [1, 3]


def test_team11_good_idea(team11_index):
    # :106-120 — ["good", "idea"] phrase → docs 0, 2, 6
    got = [r["docid"] for r in search_phrase(team11_index, "good idea").collect()]
    assert got == [0, 2, 6]


def test_team6_and_miss(team11_index):
    # Team6AndSearchTest pattern (:89-117): conjunction with a term absent
    # from the corpus → empty
    assert search_and(team11_index, ["pizza", "nonexistentterm"]).count() == 0


# Pre-merge AND-miss semantics over a SEGMENTED index (quirk #4,
# InvertedIndexManager.java:968-973): a segment whose dictionary lacks any
# conjunct contributes nothing. Fixture: segment 1 contains "cat" docs but
# no "bone" anywhere, so the reference skips it entirely; the union over
# surviving segments must equal corpus-wide AND on the merged index.
TEAM6_SEGMENTS = [
    ["cat dog bone", "cat plays with the dog", "dog eats a bone"],  # has both terms
    ["cat fish swims", "cat naps all day"],                          # no "bone" → skipped
]


def test_team6_and_miss_multi_segment(spark):
    from mini_search_engine_spark.search import search_and_segments

    all_docs = [t for seg in TEAM6_SEGMENTS for t in seg]
    segs = []
    off = 0
    for texts in TEAM6_SEGMENTS:
        rows = [(off + i, t, "en", "t", len(t)) for i, t in enumerate(texts)]
        segs.append(
            build_index(
                load_corpus(
                    spark.createDataFrame(
                        rows,
                        "doc_id long, text string, lang string, source string, n_chars long",
                    )
                ),
                analyzer="porter",
                block_span=4,
            )
        )
        off += len(texts)
    # reference pre-merge semantics
    per_segment = [r["docid"] for r in search_and_segments(segs, ["cat", "bone"]).collect()]
    assert per_segment == [0]  # only "cat dog bone"; segment 1 skipped wholesale
    # corpus-wide AND on the merged index gives the identical answer — the
    # segment skip is an optimization, not an observable semantic
    merged = merge_segments(segs)
    corpus_wide = [r["docid"] for r in search_and(merged, ["cat", "bone"]).collect()]
    assert corpus_wide == per_segment
    # a conjunct absent from EVERY segment → empty (matches single-index case)
    assert search_and_segments(segs, ["cat", "nonexistentterm"]).count() == 0


# ---------------------------------------------------------------------------
# Team5DocumentFrequencyTest.java:30-80 — per-segment document frequency
# with the Porter analyzer; segments are the reference's flush batches.
# ---------------------------------------------------------------------------

TEAM5_SEGMENTS = [
    ["cat dog toy", "cat Dot", "cat dot toy"],  # segment 0 (flush 1)
    ["cat toy Dog", "toy dog cat"],             # segment 1 (flush 2)
    ["cat Dog"],                                # segment 2 (flush 3)
]

# analyzer.analyze("cat dog Toy Dot") → [cat, dog, toi, dot]; expected df per
# (term, segment) straight from the reference asserts (:52-79)
TEAM5_EXPECTED = {
    "cat": [3, 2, 1],
    "dog": [1, 2, 1],
    "toi": [2, 2, 0],
    "dot": [2, 0, 0],
}


def test_team5_per_segment_document_frequency(spark):
    from mini_search_engine_spark.analysis import analyze

    assert analyze("cat dog Toy Dot") == ["cat", "dog", "toi", "dot"]
    segs = [
        build_index(_corpus(spark, texts), analyzer="porter", block_span=4)
        for texts in TEAM5_SEGMENTS
    ]
    for term, expected in TEAM5_EXPECTED.items():
        got = []
        for seg in segs:
            rows = seg.termstats.filter(f"term = '{term}'").collect()
            got.append(int(rows[0]["df"]) if rows else 0)
        assert got == expected, (term, got, expected)

    # getNumDocuments per segment (Team2TfIdfTest.java:54-55 pattern) and
    # the merged total
    assert [s.n_docs for s in segs] == [3, 2, 1]
    merged = merge_segments(segs, rebase_docids=True)
    assert merged.n_docs == 6
    dfm = {r["term"]: r["df"] for r in merged.termstats.collect()}
    assert dfm["cat"] == 6 and dfm["dog"] == 4 and dfm["toi"] == 4 and dfm["dot"] == 2


def test_and_segments_job_count_constant_in_segments(spark):
    """The segmented-AND path issues ONE probe job + ONE postings plan
    regardless of segment count (VERDICT r2 item 4) — job count with 4
    segments must not exceed job count with 2."""
    from mini_search_engine_spark.search import search_and_segments

    def make_segs(n_segs):
        segs, off = [], 0
        for s in range(n_segs):
            texts = [f"cat dog seg{s} filler", "dog bone here", "cat bone there"]
            rows = [(off + i, t, "en", "t", len(t)) for i, t in enumerate(texts)]
            segs.append(
                build_index(
                    load_corpus(
                        spark.createDataFrame(
                            rows,
                            "doc_id long, text string, lang string, source string, n_chars long",
                        )
                    ),
                    analyzer="porter",
                    block_span=4,
                )
            )
            off += len(texts)
        for seg in segs:
            seg.postings.count()  # materialize build caches OUTSIDE the group
        return segs

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(n_segs):
        segs = make_segs(n_segs)
        group = f"andseg-{n_segs}"
        sc.setJobGroup(group, group)
        try:
            search_and_segments(segs, ["cat", "bone"]).collect()
        finally:
            sc.setJobGroup(None, None)
        for seg in segs:
            seg.unpersist()
        return len(tracker.getJobIdsForGroup(group))

    j2, j4 = jobs_for(2), jobs_for(4)
    assert j4 <= j2, (j2, j4)
