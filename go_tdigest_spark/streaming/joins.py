"""Stream-stream time joins with bounded state.

The batch tier's `interval_join` (operators/asof.py) answers "which
interval contains this point" over data at rest; live pipelines ask the
same question over two unbounded streams (impressions x attribution
windows, errors x incident windows).  Structured Streaming supports
this natively IF the join condition lets the engine bound its state:
both sides watermarked, and the point's event time constrained to a
range around the interval's watermark column.

The contract that makes cleanup possible: every interval's length is at
most ``max_interval``.  The join condition is then

    point.by == interval.by
    AND point_ts >= start_ts
    AND point_ts <= start_ts + max_interval   (state bound, implied by
    AND point_ts <= end_ts                     the real predicate when
                                               the contract holds)

so the engine drops interval state once the point watermark passes
``start + max_interval`` and point state once it passes the interval
watermark.  Without the ``start + max_interval`` term the state would
be unbounded (Spark cannot see that ``end`` is near ``start``).

The length contract is enforced LOUDLY per row (CASE + raise_error), not
assumed: an over-long interval would otherwise silently lose matches in
its tail — the worst failure mode for an attribution pipeline.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_interval_join"]


def streaming_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: Sequence[str],
    max_interval: str = "10 minutes",
    point_watermark: str = "10 minutes",
    interval_watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join of point rows to every
    interval row containing them (``start <= p <= end``, inclusive),
    within the same ``by`` keys — the streaming counterpart of the batch
    ``interval_join``, same inclusive semantics (cumulative output over
    all triggers equals the batch join, tested).

    ``max_interval`` is the state-cleanup bound: every interval must
    satisfy ``end <= start + max_interval`` (validated per row, loud
    failure).  Watermarks control how much late data each side accepts;
    state per key is O(rows within watermark + max_interval horizon).
    """
    by = list(by)
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)} — "
            "rename before joining"
        )
    # column API (not f-string SQL) so non-simple column names resolve
    # the same way they do in the batch twin
    horizon = F.expr(f"INTERVAL {max_interval}")
    checked_end = F.when(
        F.col(end_ts) > F.col(start_ts) + horizon,
        F.raise_error(
            F.lit(
                "streaming_interval_join: interval longer than max_interval"
            )
        ).cast("timestamp"),
    ).otherwise(F.col(end_ts))
    p = points.withWatermark(point_ts, point_watermark)
    iv = (
        intervals.withColumn(end_ts, checked_end)
        .withWatermark(start_ts, interval_watermark)
    )
    cond = F.lit(True)
    for k in by:
        cond = cond & (p[k] == iv[k])
    cond = (
        cond
        & (p[point_ts] >= iv[start_ts])
        & (p[point_ts] <= iv[start_ts] + horizon)
        & (p[point_ts] <= iv[end_ts])
    )
    joined = p.join(iv, cond, "inner")
    # shared by-columns once, like the batch operator
    return joined.drop(*[iv[k] for k in by])
