"""Unit tests for ops/pipeline.py — PII redaction, Gopher-style repetition
signals, deterministic hash sampling. Each checks the Catalyst expression
against a plain-Python reference on small hand-built rows."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from mini_search_engine_spark.ops import (
    hash_sample,
    pii_redact,
    repetition_scores,
    stratified_hash_sample,
)
from mini_search_engine_spark.ops.pipeline import (
    EMAIL_PATTERN,
    IPV4_PATTERN,
    PHONE_PATTERN,
)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "contact bob.smith+tag@example.co.uk or call 415-555-0199 now"),
        (1, "server at 10.0.42.7 and backup 192.168.1.254 replied"),
        (2, "no pii here, just plain text about spark"),
        (3, "a@b.io x@y.z 555-123-4567 555.987.6543 1.2.3.4"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "docid long, content string")


def test_pii_redact_counts_and_text(pii_docs):
    out = {r["docid"]: r for r in pii_redact(pii_docs).collect()}
    for r in pii_docs.collect():
        text = r["content"]
        exp_emails = len(re.findall(EMAIL_PATTERN, text))
        got = out[r["docid"]]
        assert got["n_emails"] == exp_emails
        assert got["n_phones"] == len(re.findall(PHONE_PATTERN, text))
        assert got["n_ips"] == len(re.findall(IPV4_PATTERN, text))
        red = re.sub(EMAIL_PATTERN, "<EMAIL>", text)
        red = re.sub(PHONE_PATTERN, "<PHONE>", red)
        red = re.sub(IPV4_PATTERN, "<IP>", red)
        assert got["redacted"] == red
    # spot-check semantics, not just parity
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["n_ips"] == 2
    assert "<EMAIL>" in out[0]["redacted"] and "415-555" not in out[0]["redacted"]
    assert out[2]["redacted"] == "no pii here, just plain text about spark"
    # "x@y.z" has a 1-char TLD — must NOT match ([A-Za-z][A-Za-z]+ needs 2+)
    assert out[3]["n_emails"] == 1


def _py_repetition(text):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    c = Counter(toks)
    dup = (n - len(c)) / n
    top = max(c.values()) / n
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    topb = max(Counter(bgs).values()) / len(bgs) if bgs else 0.0
    return n, dup, top, topb


def test_repetition_scores_vs_python(spark):
    rows = [
        (0, "spam spam spam spam eggs"),
        (1, "all tokens here are fully distinct words"),
        (2, "ab cd ab cd ab cd ab cd"),  # dominant bigram runs
        (3, "one"),
        (4, ""),
        (5, "Mixed CASE mixed case MIXED case"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    out = {r["docid"]: r for r in repetition_scores(docs).collect()}
    for docid, text in rows:
        n, dup, top, topb = _py_repetition(text)
        got = out[docid]
        assert got["n_tokens"] == n
        assert got["dup_token_frac"] == pytest.approx(dup, abs=1e-6)
        assert got["top_token_frac"] == pytest.approx(top, abs=1e-6)
        assert got["top_bigram_frac"] == pytest.approx(topb, abs=1e-6)
        assert got["keep"] == (dup <= 0.75 and top <= 0.30 and topb <= 0.18)
    assert not out[0]["keep"]  # spam-dominated
    assert out[1]["keep"]
    assert not out[2]["keep"]  # "ab cd" bigram frac 4/7 > 0.18


def _py_hash_bucket(salt, docid):
    h = hashlib.md5(f"{salt}|{docid}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def test_hash_sample_deterministic(spark):
    docs = spark.createDataFrame([(i, "x") for i in range(2000)], "docid long, content string")
    kept = sorted(r["docid"] for r in hash_sample(docs, 0.3, salt="s1").collect())
    # exactly the python-reference selection, twice (determinism)
    exp = sorted(i for i in range(2000) if _py_hash_bucket("s1", i) < 300_000)
    assert kept == exp
    assert kept == sorted(r["docid"] for r in hash_sample(docs, 0.3, salt="s1").collect())
    # rate lands near 30%, and a different salt draws a different sample
    assert 0.25 < len(kept) / 2000 < 0.35
    kept2 = sorted(r["docid"] for r in hash_sample(docs, 0.3, salt="s2").collect())
    assert kept2 != kept
    # nested property: a higher-rate sample is a superset of a lower-rate one
    kept_half = set(r["docid"] for r in hash_sample(docs, 0.5, salt="s1").collect())
    assert set(kept) <= kept_half


def test_stratified_hash_sample(spark):
    rows = [(i, "x", ["en", "de", "fr"][i % 3]) for i in range(3000)]
    docs = spark.createDataFrame(rows, "docid long, content string, lang string")
    rates = {"en": 0.5, "de": 0.1}
    out = stratified_hash_sample(docs, rates, salt="mix")
    got = sorted((r["docid"], r["lang"]) for r in out.collect())
    exp = sorted(
        (i, lang)
        for i, _, lang in rows
        if _py_hash_bucket("mix", i) < int(rates.get(lang, 0.0) * 1_000_000)
    )
    assert got == exp
    by_lang = Counter(lang for _, lang in got)
    assert by_lang["fr"] == 0  # default rate 0
    assert 0.35 < by_lang["en"] / 1000 < 0.65
    assert by_lang["de"] / 1000 < 0.2


def test_pipeline_ops_no_shuffle(spark):
    """All three pipeline ops are per-row maps — their physical plans must
    contain no Exchange (they fuse into the scan at scale)."""
    docs = spark.createDataFrame([(0, "a b c", "en")], "docid long, content string, lang string")
    for df in (
        pii_redact(docs),
        repetition_scores(docs),
        hash_sample(docs, 0.5),
        stratified_hash_sample(docs, {"en": 0.5}),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# gap-based sessionization (ops/sessions.py)


def test_sessionize_hand_computed(spark):
    """30-min gap splits exactly where expected; session_no counts from 1
    per user in time order; singleton sessions have duration 0."""
    from datetime import datetime

    from mini_search_engine_spark.ops import session_stats, sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes, seconds=0):
        return datetime(2024, 1, 1, minutes // 60, minutes % 60, seconds)

    rows = [
        # user 1: 3 events tight, 31-min gap, then 2 more
        (0, at(0), 1, "view"),
        (1, at(10), 1, "click"),
        (2, at(20), 1, "view"),
        (3, at(51), 1, "view"),  # 31 min > 30 → new session
        (4, at(60), 1, "purchase"),
        # user 2: exactly 30-min gap must NOT split (strict >)
        (5, at(0), 2, "view"),
        (6, at(30), 2, "view"),
        # user 3: singleton
        (7, at(5), 3, "signup"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    s = {
        (r.user_id, r.event_id): r.session_no
        for r in sessionize(ev, gap_minutes=30.0).collect()
    }
    assert s == {
        (1, 0): 1, (1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 2,
        (2, 5): 1, (2, 6): 1,
        (3, 7): 1,
    }

    stats = {
        (r.user_id, r.session_no): (r.n_events, r.duration_s, r.n_types)
        for r in session_stats(ev, gap_minutes=30.0).collect()
    }
    assert stats == {
        (1, 1): (3, 20 * 60, 2),
        (1, 2): (2, 9 * 60, 2),
        (2, 1): (2, 30 * 60, 1),
        (3, 1): (1, 0, 1),
    }
    assert t0 == at(0)


def test_sessionize_single_exchange(spark):
    """Both window passes and the session agg reuse ONE hash exchange on
    user_id — the plan must contain exactly one Exchange."""
    from mini_search_engine_spark.ops import session_stats

    ev = spark.createDataFrame(
        [(0, 1, "view")], "event_id long, user_id long, event_type string"
    ).selectExpr(
        "event_id", "timestamp'2024-01-01' as ts", "user_id", "event_type"
    )
    plan = session_stats(ev)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# ---------------------------------------------------------------------------
# as-of join (ops/asof.py)


def _asof_fixtures(spark):
    from datetime import datetime

    def at(m):
        return datetime(2024, 1, 1, m // 60, m % 60)

    left = spark.createDataFrame(
        [
            (0, 1, at(5)),    # before any quote → NULL
            (1, 1, at(10)),   # exactly at quote q1 → inclusive match q1
            (2, 1, at(25)),   # between q1(10) and q2(30) → q1
            (3, 1, at(65)),   # after q2(30) → q2 (35 min back)
            (4, 2, at(50)),   # user 2: only quote at 40 → q3
            (5, 3, at(50)),   # user 3 has no quotes at all → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 1, at(10), 100.0),
            (11, 1, at(10), 111.0),  # same (key, ts): greater quote_id wins
            (20, 1, at(30), 200.0),
            (30, 2, at(40), 300.0),
        ],
        "quote_id long, user_id long, qts timestamp, price double",
    )
    return left, right


def test_asof_join_hand_computed(spark):
    from mini_search_engine_spark.ops import asof_join

    left, right = _asof_fixtures(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="qts",
        payload=["quote_id", "price"], tie_break="quote_id",
    )
    got = {r.event_id: (r.quote_id, r.price) for r in out.collect()}
    assert got == {
        0: (None, None),
        1: (11, 111.0),   # inclusive + tie-break to greatest quote_id
        2: (11, 111.0),
        3: (20, 200.0),
        4: (30, 300.0),
        5: (None, None),
    }
    assert out.count() == left.count()  # every left row survives


def test_asof_join_tolerance(spark):
    from mini_search_engine_spark.ops import asof_join

    left, right = _asof_fixtures(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="qts",
        payload=["quote_id", "price"], tie_break="quote_id",
        tolerance_s=20 * 60,
    )
    got = {r.event_id: r.quote_id for r in out.collect()}
    # event 3 is 35 min after q2 → nulled by the 20-min tolerance;
    # event 4 is 10 min after q3 → kept
    assert got == {0: None, 1: 11, 2: 11, 3: None, 4: 30, 5: None}


def test_asof_join_single_exchange(spark):
    """The union-merge as-of join must cost ONE hash exchange on the key —
    no range join, no dedup pre-shuffle."""
    from mini_search_engine_spark.ops import asof_join

    left, right = _asof_fixtures(spark)
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="qts",
        payload=["quote_id", "price"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_payload_collision_raises(spark):
    import pytest as _pytest

    from mini_search_engine_spark.ops import asof_join

    left, right = _asof_fixtures(spark)
    with _pytest.raises(ValueError, match="collides"):
        asof_join(
            left, right.withColumnRenamed("quote_id", "event_id"),
            on="user_id", left_ts="ts", right_ts="qts",
            payload=["event_id", "price"],
        )


# ---------------------------------------------------------------------------
# weighted epoch mixing (ops/pipeline.py epoch_mix)


def test_epoch_mix_matches_python_reference(spark):
    from mini_search_engine_spark.ops import epoch_mix

    rows = [(i, "x", ["en", "de", "fr"][i % 3]) for i in range(900)]
    docs = spark.createDataFrame(rows, "docid long, content string, lang string")
    weights = {"en": 2.5, "de": 1.0, "fr": 0.25}
    out = sorted(
        (r.docid, r.epoch) for r in epoch_mix(docs, weights, salt="m").collect()
    )

    def n_copies(i, lang):
        w = weights[lang]
        return int(w) + (1 if _py_hash_bucket("m", i) < round((w - int(w)) * 1e6) else 0)

    exp = sorted(
        (i, e) for i, _, lang in rows for e in range(n_copies(i, lang))
    )
    assert out == exp
    # expected-epoch property: per-lang mean copy count ≈ its weight
    from collections import Counter as _C

    per_doc = _C(d for d, _ in out)
    en_mean = sum(per_doc[i] for i in range(0, 900, 3)) / 300
    assert 2.3 < en_mean < 2.7
    # de weight 1.0 → exactly one copy each, epoch always 0
    assert all(per_doc[i] == 1 for i in range(1, 900, 3))


def test_epoch_mix_no_shuffle(spark):
    from mini_search_engine_spark.ops import epoch_mix

    docs = spark.createDataFrame([(0, "x", "en")], "docid long, content string, lang string")
    plan = epoch_mix(docs, {"en": 1.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_asof_join_null_payload_is_atomic(spark):
    """A right row whose payload legitimately contains NULL must be carried
    WHOLE: per-column last(ignorenulls) windows would stitch its non-NULL
    columns with an OLDER row's values for the NULL ones (ADVICE r4)."""
    from datetime import datetime

    from mini_search_engine_spark.ops import asof_join

    def at(m):
        return datetime(2024, 1, 1, m // 60, m % 60)

    left = spark.createDataFrame(
        [(0, 1, at(50))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, at(10), 100.0),   # older row, price present
            (20, 1, at(40), None),    # NEWEST matching row, price NULL
        ],
        "quote_id long, user_id long, qts timestamp, price double",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="qts",
        payload=["quote_id", "price"], tie_break="quote_id",
    ).collect()
    assert len(out) == 1
    r = out[0]
    # the whole newest row: quote_id 20 WITH its NULL price — never
    # quote_id 20 + price 100.0 stitched from the older row
    assert r["quote_id"] == 20 and r["price"] is None
