"""Serving facade: leader-follower micro-batching for concurrent BM25.

BENCH/SERVING.md's finding: warm-index serving latency is stage-WAVE
bound — every concurrent ``bm25_topk`` call pays its own driver round
trips and scheduling waves even though each scan is tiny, so p50 at 32
callers sat at ~4 s while the aggregate scan work was well under a
second. The fix production search tiers use (and the one
``bm25_topk_batch``'s docstring promises): coalesce concurrent arrivals
into ONE batched scoring job.

``Bm25MicroBatcher`` implements leader-follower batching: the first
arrival in an empty window becomes the LEADER, sleeps ``window_ms``
(the batching window), drains everything that queued behind it, and
runs a single ``bm25_topk_batch`` job whose results fan back out to the
waiting callers' futures. Followers just wait on their future. A lone
query therefore pays ``window_ms`` extra (bounded, ~15 ms against a
~0.5 s query) and a convoy of 32 pays ONE job instead of 32.

Per-query results are IDENTICAL to ``bm25_topk`` — ``bm25_topk_batch``
computes the same scores from the same global stats, and the facade
returns each query's rows in rank order (the single-query window also
routes through the batch path, keeping one code path under test).
"""

from __future__ import annotations

import itertools
import threading
import time
from concurrent.futures import Future

from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.search.ranking import bm25_topk_batch


class Bm25MicroBatcher:
    """Thread-safe micro-batching front for ``bm25_topk`` traffic.

    ``submit(keywords)`` returns a Future resolving to the query's
    ``[(docid, score), ...]`` top-k (rank order); ``bm25_topk(keywords)``
    is the blocking convenience. ``batches`` / ``served`` expose how many
    jobs vs queries ran (the amortization evidence)."""

    def __init__(
        self,
        index: InvertedIndex,
        topk: int = 10,
        window_ms: float = 15.0,
        max_batch: int = 256,
    ):
        self.index = index
        self.topk = topk
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self._lock = threading.Lock()
        self._pending: list[tuple[str, list[str], Future]] = []
        self._leader_active = False
        self._seq = itertools.count()
        self.batches = 0
        self.served = 0

    def submit(self, keywords: list[str]) -> Future:
        fut: Future = Future()
        qid = f"q{next(self._seq)}"
        with self._lock:
            self._pending.append((qid, list(keywords), fut))
            lead = not self._leader_active
            if lead:
                self._leader_active = True
        if lead:
            try:
                time.sleep(self.window_s)
                while True:
                    with self._lock:
                        batch = self._pending[: self.max_batch]
                        self._pending = self._pending[len(batch) :]
                        if not batch:
                            # nothing left — release leadership INSIDE the
                            # lock so no arrival slips between drain and
                            # release without a leader
                            self._leader_active = False
                            break
                    self._run(batch)  # never raises (fans errors to futures)
            finally:
                with self._lock:  # belt-and-braces: a leader never absconds
                    self._leader_active = False
        return fut

    def bm25_topk(self, keywords: list[str]) -> list[tuple[int, float]]:
        return self.submit(keywords).result()

    def _run(self, batch: list[tuple[str, list[str], Future]]) -> None:
        try:
            queries = {qid: kws for qid, kws, _ in batch}
            rows = bm25_topk_batch(self.index, queries, topk=self.topk).collect()
            by_qid: dict[str, list[tuple[int, int, float]]] = {}
            for r in rows:
                by_qid.setdefault(r["qid"], []).append(
                    (r["rank"], r["docid"], r["score"])
                )
            self.batches += 1
            for qid, _, fut in batch:
                got = sorted(by_qid.get(qid, []))
                fut.set_result([(d, s) for _, d, s in got])
                self.served += 1
        except BaseException as e:  # fan the failure out — no caller hangs
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
