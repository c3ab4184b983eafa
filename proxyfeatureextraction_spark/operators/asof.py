"""As-of merge and bucketed interval join (SURVEY.md §2.3 J4/J5).

Spark has no native as-of operator. Two authoring patterns cover it at
any scale, with no Catalyst extension:

- **keyed as-of** (`asof_join`): union-tag both sides, one window per
  key, backward ``last(ignorenulls)`` — frame ends at currentRow, so
  it is point-in-time safe by construction (reference analog: the
  backward-nearest generalization of ``corr_extractor.py:67-88``).
- **global-stream as-of** (`asof_join_global`): an un-keyed window
  would serialize onto one partition; instead bucket time, carry each
  bucket's closing value forward through a tiny bucket-summary table
  (broadcast), then resolve within-bucket with a partitioned window.
- **interval join** (`interval_join`): explode each span into the time
  buckets it covers, equi-join points on bucket, residual range filter
  — avoids BroadcastNestedLoopJoin (reference analog: the mask scan of
  ``dl_experiments.py:418-430`` / searchsorted at ``:700-706``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_tag"
_RTS = "_asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    value_cols: list[str],
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of: for each left row, the latest right values with
    ``right.ts <= left.ts`` within the same ``by`` key (exact-match
    inclusive). Right columns appear as ``<col><suffix>``.

    Semantics notes (review-hardened):

    - each value column back-fills INDEPENDENTLY from the latest right
      row where THAT column is non-null, and ``tolerance`` is measured
      against that same row — so a newer right row carrying NULL in one
      column neither masks the older value nor falsely refreshes its
      staleness clock;
    - right rows tying on (key, ts) resolve deterministically to the
      greatest value tuple (window order includes the value columns as
      the final tiebreak), so reruns and repartitionings agree.
    """
    vr = [f"{c}{suffix}" for c in value_cols]
    rts = [f"{_RTS}_{v}" for v in vr]
    l_cols = left.columns
    lhs = left.select(
        *l_cols,
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v) for c, v in zip(value_cols, vr)],
        *[F.lit(None).cast("double").alias(r) for r in rts],
    )
    rhs = right.select(
        *by,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in by and c != ts_col],
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(v) for c, v in zip(value_cols, vr)],
        # per-value timestamp: set only where that value is non-null, so
        # the staleness clock tracks the row the value actually came from
        *[
            F.when(F.col(c).isNotNull(), F.col(ts_col).cast("double")).alias(r)
            for c, r in zip(value_cols, rts)
        ],
    ).select(*lhs.columns)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col(_TAG), *[F.col(v) for v in vr])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs)
    for v in [*vr, *rts]:
        filled = filled.withColumn(v, F.last(v, ignorenulls=True).over(w))
    out = filled.filter(F.col(_TAG) == 1).drop(_TAG)
    if tolerance is not None:
        for v, r in zip(vr, rts):
            stale = F.col(ts_col).cast("double") - F.col(r) > F.lit(float(tolerance))
            out = out.withColumn(v, F.when(stale, F.lit(None)).otherwise(F.col(v)))
    return out.drop(*rts)


def asof_join_global(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_seconds: float = 60.0,
    out_col: str | None = None,
) -> DataFrame:
    """Backward as-of against an UN-KEYED stream, scalable: no global
    window. Right's latest value per time bucket is carried forward via
    a broadcast bucket summary; within-bucket resolution reuses the
    keyed pattern with the bucket as the key."""
    out_col = out_col or f"{value_col}_asof"
    b = lambda c: F.floor(F.col(c).cast("double") / F.lit(bucket_seconds))  # noqa: E731

    rb = right.withColumn("_b", b(ts_col))
    lb = left.withColumn("_b", b(ts_col))

    # bucket-summary table: one row per bucket present on either side
    # (tiny vs the data: span/bucket_seconds rows), close value only on
    # right buckets; carry-in for bucket b = latest close strictly
    # before b. The single-partition window runs over summaries only.
    closes = rb.groupBy("_b").agg(F.max_by(value_col, F.col(ts_col)).alias("_close"))
    all_b = lb.select("_b").union(rb.select("_b")).distinct()
    wseq = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    summary = (
        all_b.join(closes, "_b", "left")
        .withColumn("_carry", F.last("_close", ignorenulls=True).over(wseq))
        .select("_b", "_carry")
    )

    keyed = asof_join(
        lb.join(F.broadcast(summary), "_b", "left"),
        rb.select("_b", ts_col, value_col),
        ts_col=ts_col,
        by=["_b"],
        value_cols=[value_col],
        suffix="_inb",
    )
    return keyed.withColumn(
        out_col, F.coalesce(F.col(f"{value_col}_inb"), F.col("_carry"))
    ).drop("_b", "_carry", f"{value_col}_inb")


def interval_join(
    spans: DataFrame,
    points: DataFrame,
    point_ts: str,
    span_start: str,
    span_end: str,
    bucket_seconds: float = 60.0,
    how: str = "inner",
) -> DataFrame:
    """Range join via bucketization: each span row is exploded into the
    buckets it covers, points are bucketed once, the join is a plain
    equi-join on bucket + residual range predicate. Span/bucket-width
    ratio bounds the fan-out (pick bucket ≈ median span length).

    INNER only: the residual range filter runs after the bucket join,
    so an outer variant would either drop its unmatched rows at that
    filter (silent inner degradation) or surface one null-padded row
    per bucket replica. Callers needing point-less spans should
    left-anti join the spans against this result instead.
    """
    if how != "inner":
        raise ValueError(
            f"interval_join supports how='inner' only (got {how!r}): the "
            f"residual range filter after the bucket equi-join cannot "
            f"preserve outer semantics over exploded span replicas. "
            f"Recover unmatched spans with spans.join(result, ..., 'left_anti')."
        )
    w = float(bucket_seconds)
    s = spans.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(span_start).cast("double") / w).cast("long"),
                F.floor(F.col(span_end).cast("double") / w).cast("long"),
            )
        ),
    )
    p = points.withColumn("_b", F.floor(F.col(point_ts).cast("double") / w).cast("long"))
    cond = (
        (F.col(point_ts).cast("double") >= F.col(span_start).cast("double"))
        & (F.col(point_ts).cast("double") <= F.col(span_end).cast("double"))
    )
    return s.join(p, on="_b", how=how).filter(cond).drop("_b")
