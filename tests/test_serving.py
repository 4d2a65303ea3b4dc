"""Micro-batching serving facade: per-query results identical to
bm25_topk, concurrent arrivals coalesce into fewer jobs."""

from concurrent.futures import ThreadPoolExecutor

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import Bm25MicroBatcher, bm25_topk


def _corpus(spark):
    rows = [
        (i, f"alpha word{i % 7} beta gamma{i % 3} common text", "en", "t", 0)
        for i in range(120)
    ]
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )


def test_microbatcher_matches_bm25_topk(spark):
    idx = build_index(_corpus(spark), analyzer="porter", block_span=16)
    try:
        queries = [
            ["alpha", "word1"],
            ["gamma1"],
            ["beta", "word3", "gamma2"],
            ["word5"],
            ["alpha"],
            ["nosuchterm"],
            ["the", "of"],  # stopword-only -> empty
            ["word2", "word2", "beta"],
        ] * 4  # 32 concurrent callers
        mb = Bm25MicroBatcher(idx, topk=5, window_ms=30)
        with ThreadPoolExecutor(32) as pool:
            futs = [pool.submit(mb.bm25_topk, q) for q in queries]
            got = [f.result(timeout=300) for f in futs]
        for q, res in zip(queries, got):
            ref = [
                (r["docid"], r["score"]) for r in bm25_topk(idx, q, topk=5).collect()
            ]
            assert len(res) == len(ref), q
            assert all(d == rd for (d, _), (rd, _) in zip(res, ref)), (q, res, ref)
            assert all(abs(s - rs) < 1e-9 for (_, s), (_, rs) in zip(res, ref)), q
        # the whole point: 32 queries ran as far fewer batched jobs
        assert mb.served == len(queries)
        assert mb.batches < len(queries) / 2, mb.batches
    finally:
        idx.unpersist()


def test_microbatcher_error_fanout(spark):
    idx = build_index(_corpus(spark), analyzer="porter", block_span=16)
    try:
        mb = Bm25MicroBatcher(idx, topk=5, window_ms=5)
        idx.postings.unpersist()
        # sabotage: break the batch runner, every waiting future must fail
        mb.index = None
        futs = [mb.submit(["alpha"]) for _ in range(3)]
        for f in futs:
            try:
                f.result(timeout=60)
                raised = False
            except BaseException:
                raised = True
            assert raised
        # lone query after recovery works (leadership was released)
        mb.index = idx
        assert isinstance(mb.bm25_topk(["alpha"]), list)
    finally:
        idx.unpersist()
