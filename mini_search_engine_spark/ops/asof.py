"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the payload of the LAST right row with the
same key whose timestamp is <= the left timestamp (backward inclusive),
optionally within a tolerance window. The canonical point-in-time
enrichment: events against slowly-changing dimensions, trades against
quotes, crawl snapshots against repo metadata.

Spark-first shape — the union-merge pattern, NOT a range join:

    union(right-tagged, left-tagged)
      → ONE hash exchange on the key
      → partition-local sort by (ts, side)
      → last_value(payload STRUCT, ignoreNulls) running window — one
        atomic struct per right row, so every payload column (and the
        matched timestamp) comes from the same right row even when some
        payload values are NULL
      → filter back to left rows

Cost class is a single sort-merge pass: one exchange + one sort,
regardless of how far back the match lies. The naive alternatives die at
scale: an inequality join (l.ts >= r.ts) is a broadcast-nested-loop /
range explosion, and per-key collect is a driver loop. Skew behaves like
any sort-merge join on the same key (AQE skew split applies).

Determinism: when several right rows share (key, ts), the one with the
greatest ``tie_break`` column wins — folded into the merge sort order
here (ascending tie_break puts the winner last in the running frame); a
SQL oracle should dedupe its right side the same way. DuckDB's native
ASOF JOIN leaves that case unspecified, so pinning it keeps engines
comparable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"  # 0 = right (emitter), 1 = left (receiver)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tie_break: str | None = None,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload`` columns from
    the latest ``right`` row with equal ``on`` keys and
    ``right_ts <= left_ts`` (NULL payload when no such row, or when the
    match is older than ``tolerance_s`` seconds).

    ``payload`` names must not collide with left columns. ``tie_break``
    (default: first payload column) orders right rows sharing (key, ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(payload)
    tie = tie_break or payload[0]
    if bad := set(payload) & set(left.columns):
        raise ValueError(f"payload collides with left columns: {sorted(bad)}")

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        *[F.col(p) for p in payload],
    )

    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
    )
    # Align schemas for the union: left carries NULL payload, right
    # carries NULL left-only columns.
    l_tagged = l.withColumn(_SIDE, F.lit(1))
    for p in payload:
        l_tagged = l_tagged.withColumn(p, F.lit(None).cast(dict(r.dtypes)[p]))
    r_tagged = r.withColumn(_SIDE, F.lit(0))
    for c in left_cols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    cols = left_cols + ["__ts", _SIDE] + payload
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # Right rows sort BEFORE left rows at the same ts (side 0 < 1), so a
    # backward-inclusive match sees same-instant right rows; among right
    # rows sharing (key, ts), ascending tie_break puts the winner LAST in
    # the frame, so the running last_value keeps it — no dedup pre-pass,
    # no second exchange.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col(_SIDE).asc(), F.col(tie).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct per right row (NULL for left rows) carried by a single
    # last(ignorenulls) — payload columns and the matched timestamp are
    # unpacked from the SAME right row, so a right row whose payload
    # legitimately contains NULL values never gets stitched with older
    # rows' values (per-column windows would skip over its NULL fields),
    # and __match_ts always refers to the row the values came from.
    pay_struct = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col("__ts").alias("__match_ts"),
            *[F.col(p).alias(p) for p in payload],
        ),
    )
    carried = F.last(pay_struct, ignorenulls=True).over(w)

    out = (
        u.select(
            *[F.col(c) for c in left_cols],
            F.col(_SIDE),
            F.col("__ts"),
            carried.alias("__m"),
        )
        .filter(F.col(_SIDE) == 1)
        .select(
            *[F.col(c) for c in left_cols],
            F.col("__ts"),
            F.col("__m.__match_ts").alias("__match_ts"),
            *[F.col(f"__m.{p}").alias(p) for p in payload],
        )
    )

    if tolerance_s is not None:
        lag_us = F.unix_micros(F.col("__ts").cast("timestamp")) - F.unix_micros(
            F.col("__match_ts").cast("timestamp")
        )
        ok = F.col("__match_ts").isNotNull() & (
            lag_us <= int(tolerance_s * 1_000_000)
        )
        out = out.select(
            *[F.col(c) for c in left_cols],
            F.when(ok, F.col("__match_ts")).alias("__match_ts"),
            *[F.when(ok, F.col(p)).otherwise(F.lit(None)).alias(p) for p in payload],
        )
    return out.select(*left_cols, *payload)
