"""As-of join — the canonical time-series lookup Spark lacks natively
(SURVEY.md §2.3 `join_asof`, §4).

Semantics (backward, inclusive — matches DuckDB `ASOF LEFT JOIN ... ON
l.key = r.key AND l.t >= r.t`): for each left row, attach the right row with
the greatest right-time <= left-time within the same key group; nulls if none.

Implementation: union-tag + window `last(ignoreNulls)`:

1. Tag right rows (payload packed into one struct) and left rows (null
   payload), union them on a common schema.
2. One window per key, ordered by (time, is_right DESC) so that at equal
   timestamps the right row sorts *before* the left row (inclusive match).
3. ``last(payload, ignoreNulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries the latest-seen right payload forward onto each left row.

Cost model: ONE hash shuffle on the key + an in-partition sort — O(n log n),
never the O(n·m) pair join. At 100 TB this is a single exchange whose skew
(hot keys) AQE cannot split (window semantics need whole partitions), so for
pathological keys pre-filter or bucket the key space upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T, _TAG, _PAYLOAD = "__asof_t", "__asof_is_right", "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    allow_exact_match: bool = True,
    direction: str = "backward",
    tolerance_secs: int | None = None,
) -> DataFrame:
    """As-of join; right payload columns land on each left row.

    ``direction='backward'`` (default): greatest right-time <= left-time
    (DuckDB ``l.t >= r.t``); ``'forward'``: smallest right-time >=
    left-time — implemented by reversing the sort order so ``last()``
    still carries the nearest match. ``allow_exact_match=False`` makes the
    comparison strict on both directions.

    ``tolerance_secs`` bounds staleness (pandas merge_asof's tolerance):
    a carried match farther than the bound from the left time is nulled
    out — the feature-join guard against silently serving hours-stale
    values across a gap in the right stream. Applied AFTER the window
    scan, so it adds one map-side conditional, no extra shuffle.
    Restriction: the gap is computed in microseconds via a timestamp
    cast, so ``tolerance_secs`` requires BOTH time columns to be
    timestamp/date-typed — numeric epoch times (e.g. unix micros) would
    be reinterpreted as seconds and silently mis-matched, so they are
    rejected with a TypeError. The join itself (no tolerance) accepts
    any orderable time type.

    ``right``'s non-key columns (including ``right_time``) must not collide
    with ``left``'s column names — alias them before calling.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if tolerance_secs is not None:
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        _time_ok = (TimestampType, TimestampNTZType, DateType)
        lt = left.schema[left_time].dataType
        rt = right.schema[right_time].dataType
        if not isinstance(lt, _time_ok) or not isinstance(rt, _time_ok):
            raise TypeError(
                "tolerance_secs requires timestamp/date time columns "
                f"(got {left_time}: {lt.simpleString()}, "
                f"{right_time}: {rt.simpleString()}); numeric epoch times "
                "would be reinterpreted as seconds — cast explicitly first"
            )
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"alias right columns before asof_join: {overlap}")

    right_tagged = right.select(
        *keys,
        F.col(right_time).alias(_T),
        F.lit(1).alias(_TAG),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    payload_type = right_tagged.schema[_PAYLOAD].dataType

    left_cols = [c for c in left.columns if c not in keys]
    left_tagged = left.select(
        *keys,
        F.col(left_time).alias(_T),
        F.lit(0).alias(_TAG),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *left_cols,
    )
    right_tagged = right_tagged.select(
        *keys,
        _T,
        _TAG,
        _PAYLOAD,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )

    # at equal time: right-before-left makes the match inclusive; flip the
    # tiebreak for strict semantics. forward = the same scan over
    # time-DESCENDING order (last-seen right row is the nearest later one).
    time_order = (
        F.col(_T).asc() if direction == "backward" else F.col(_T).desc()
    )
    tag_order = F.col(_TAG).desc() if allow_exact_match else F.col(_TAG).asc()
    win = (
        Window.partitionBy(*keys)
        .orderBy(time_order, tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        left_tagged.unionByName(right_tagged)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(win))
        .filter(F.col(_TAG) == 0)
    )
    payload = F.col(_PAYLOAD)
    if tolerance_secs is not None:
        gap = F.abs(
            F.unix_micros(F.col(_T).cast("timestamp"))
            - F.unix_micros(
                F.col(f"{_PAYLOAD}.{right_time}").cast("timestamp")
            )
        )
        payload = F.when(
            gap <= F.lit(int(tolerance_secs) * 1_000_000), F.col(_PAYLOAD)
        )
    return matched.withColumn(_PAYLOAD, payload).select(
        *keys,
        *left_cols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols],
    )
