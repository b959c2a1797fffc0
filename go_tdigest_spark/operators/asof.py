"""Time-series joins Spark lacks as built-ins: as-of join and bounded
interval (range) join — expressed as compositions of existing DataFrame
ops so Catalyst keeps optimizing them (no UDFs, no non-equi join).

Why not a plain non-equi join: Spark executes ``l.ts >= r.ts`` joins as
BroadcastNestedLoopJoin (O(N·M) compares, broadcast of a whole side) —
a scale-killer.  Both operators here reduce to ONE hash shuffle:

  - ``asof_join``: union both sides, one window pass per key ordered by
    time — ``last(value ignore nulls)`` carries the most recent right
    row forward onto each left row.  O(N+M) rows through one exchange,
    the same shape a 1000-executor cluster wants (each key's timeline
    is processed locally after the shuffle).
  - ``interval_join``: quantize time into buckets at least as wide as
    the longest interval, replicate each interval to the (≤ 2-3)
    buckets it covers, equijoin points on (keys..., bucket), then apply
    the exact BETWEEN filter.  Replication factor is
    ``1 + ceil(max_len/bucket)`` — bounded fan-out instead of a nested
    loop, the standard bucketed range-join strategy (what Databricks'
    range-join hints and KDB's window joins do under the hood).

Tie semantics (pinned, deterministic): backward as-of is INCLUSIVE — a
right row at exactly the left timestamp matches (sort places right
before left at equal ts); forward mirrors it.  Among right rows sharing
one (keys, ts) the winner would be partition-order dependent, so right
must be unique on (by..., ts_col) — same caller contract as
sample_topk_per_group's unique-key rule.

NULL semantics match the SQL oracles: a NULL key or NULL timestamp on
either side never matches (right rows with one are dropped; left rows
with one come back unmatched) — Spark's window partitioning would
otherwise group NULL keys together, which no SQL join does.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: str | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` from the
    most recent ``right`` row at-or-before its timestamp (backward) /
    the earliest at-or-after (forward), within the same ``by`` keys.
    Unmatched left rows keep NULLs (left-join semantics).

    ``tolerance`` (an SQL interval body, e.g. ``"5 minutes"``) nulls out
    matches further than that from the left timestamp.
    ``matched_ts_col`` additionally emits the matched right timestamp.

    Plan: one exchange on ``by``, one in-partition sort — no non-equi
    join, no broadcast of either side.  Right rows must be unique per
    (by..., ts) — see module docstring.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    value_cols = list(value_cols)
    clash = (set(value_cols) | {matched_ts_col}) & set(left.columns)
    clash.discard(None)
    if clash:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(clash)}"
        )
    if matched_ts_col is not None and matched_ts_col in value_cols:
        # would emit two output columns with the same name (ambiguous
        # downstream) — neither is in left.columns so the check above
        # misses it
        raise ValueError(
            f"matched_ts_col {matched_ts_col!r} collides with value_cols"
        )
    reserved = {"_src", "_rts"} & (
        set(left.columns) | set(value_cols) | {matched_ts_col}
    )
    if reserved:
        raise ValueError(
            f"input columns collide with reserved names: {sorted(reserved)}"
        )

    # SQL join semantics for NULLs (matches the ASOF oracle's ON
    # clause): right rows with a NULL key or NULL timestamp can never
    # match, so drop them up front; NULL-key/-ts LEFT rows fall out as
    # unmatched below.
    r_clean = right
    for k in [*by, ts_col]:
        r_clean = r_clean.where(F.col(k).isNotNull())

    # inclusive tie order: backward wants right BEFORE left at equal ts
    # (so last() sees it), forward wants right AFTER left (so first()
    # starting at the current row sees it)
    l_src, r_src = (1, 0) if direction == "backward" else (0, 1)
    l_tag = left.withColumn("_src", F.lit(l_src))
    r_tag = r_clean.select(
        *by,
        F.col(ts_col),
        F.lit(r_src).alias("_src"),
        *[F.col(c) for c in value_cols],
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(ts_col, "_src")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(ts_col, "_src")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    # carry the matched right row as ONE struct so the matched timestamp
    # and the values always come from the SAME row — carrying columns
    # independently with ignorenulls would let a genuinely-NULL value on
    # the matched row fall through to an older row's value
    matched = pick(
        F.when(
            F.col("_src") == r_src,
            F.struct(
                F.col(ts_col).alias("_rts"),
                *[F.col(c) for c in value_cols],
            ),
        )
    )
    matched_ts = matched["_rts"]

    # a NULL-ts left row matches nothing (SQL comparison semantics);
    # without this, forward mode's nulls-first sort would hand it the
    # earliest right row
    ok = F.col(ts_col).isNotNull()
    if tolerance is not None:
        if direction == "backward":
            ok = ok & (
                matched_ts >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
            )
        else:
            ok = ok & (
                matched_ts <= F.col(ts_col) + F.expr(f"INTERVAL {tolerance}")
            )

    out_vals = [
        F.when(ok, matched[c]).otherwise(F.lit(None)).alias(c)
        for c in value_cols
    ]
    if matched_ts_col is not None:
        out_vals.append(
            F.when(ok, matched_ts).otherwise(F.lit(None)).alias(
                matched_ts_col
            )
        )
    return (
        u.select(*left.columns, F.col("_src"), *out_vals)
        .where(F.col("_src") == l_src)
        .drop("_src")
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    left_out: Sequence[str],
    direction: str = "backward",
    matched_ts_col: str | None = None,
) -> str:
    """DuckDB twin via its NATIVE ``ASOF LEFT JOIN`` — a semantically
    independent oracle (merge-join implementation, not a window
    re-derivation of the Spark plan).  Inclusive bound matches the
    Spark tie order.

    The operator's NULL contract is spelled out rather than left to the
    engine: right rows with NULL keys/ts are filtered (DuckDB 1.0's
    ASOF matches NULL ts to NULL ts), and emitted values are gated on
    the left ts being non-NULL (DuckDB's ASOF inequality treats a NULL
    probe as high and hands it the last right row)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    cmp = ">=" if direction == "backward" else "<="
    keys = " AND ".join(f"l.{k} = r.{k}" for k in by)
    not_null = " AND ".join(f"{k} IS NOT NULL" for k in [*by, ts_col])
    gate = f"CASE WHEN l.{ts_col} IS NOT NULL THEN %s END AS %s"
    sel = [f"l.{c}" for c in left_out] + [
        gate % (f"r.{c}", c) for c in value_cols
    ]
    if matched_ts_col is not None:
        sel.append(gate % (f"r.{ts_col}", matched_ts_col))
    return (
        f"SELECT {', '.join(sel)} FROM ({left_sql}) l "
        f"ASOF LEFT JOIN (SELECT * FROM ({right_sql}) WHERE {not_null}) r "
        f"ON {keys} AND l.{ts_col} {cmp} r.{ts_col}"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: Sequence[str],
    bucket: str = "10 minutes",
) -> DataFrame:
    """Inner join of point rows to every interval row containing them
    (``start <= p <= end``, inclusive), within the same ``by`` keys.

    ``bucket`` must be AT LEAST the longest interval's length for the
    bounded-replication guarantee to be meaningful (correct regardless —
    longer intervals just replicate to more buckets, via an explicit
    ``sequence()`` over covered bucket ids).  Each point lives in
    exactly one bucket, so no pair is emitted twice and no dedup pass
    is needed.  Output carries every column of both inputs; shared
    ``by`` columns appear once.
    """
    by = list(by)
    reserved = {"_b"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError("input columns collide with reserved name '_b'")
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)} — "
            "rename before joining"
        )
    step = F.expr(f"INTERVAL {bucket}")
    zero = F.lit("1970-01-01 00:00:00").cast("timestamp")
    unit_us = F.unix_micros(zero + step) - F.unix_micros(zero)
    # TIMESTAMP_NTZ columns cast through session-TZ TIMESTAMP for
    # unix_micros — a monotone mapping applied identically to points and
    # interval bounds, so bucket co-location is unaffected.  Division +
    # long-cast truncates toward zero = floor for post-1970 data.
    bucket_of = lambda c: (  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / unit_us
    ).cast("long")
    p = points.withColumn("_b", bucket_of(point_ts))
    iv = intervals.withColumn(
        "_b",
        F.explode(F.sequence(bucket_of(start_ts), bucket_of(end_ts))),
    )
    return (
        p.join(iv, by + ["_b"])
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_b")
    )
