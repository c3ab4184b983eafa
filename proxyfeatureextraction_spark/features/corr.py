"""Gateway-correlation features — pure Spark, fully distributed.

Reference: ``corr_extractor.py:118-206`` runs a per-connection Python
loop with GPU ops inside — the exact anti-pattern this plan replaces
with one declarative pipeline:

1. tumbling 0.1 s bins via the reference's exact float formula
   (``floor(ts·10)/10``) on both sides,
2. global gateway binning ONCE (shared subplan, A4),
3. per-conv span × gateway-bin restriction as a BUCKETED range join
   (no BroadcastNestedLoopJoin),
4. full-outer align per (conv, bin) with zero-fill (J2),
5. two-pass z-score product: per-conv mean/std_pop window, then one
   groupBy with the 9 statistics (exact percentile = numpy median).

Conversations whose gateway slice is empty emit all-zero metrics
(``corr_extractor.py:89-90``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.features.names import CORR_NAMES
from proxyfeatureextraction_spark.operators.asof import interval_join
from proxyfeatureextraction_spark.operators.ordering import gated_first_k
from proxyfeatureextraction_spark.operators.windows import time_bucket

BIN_SIZE_SECONDS = 0.1


def corr_features(
    derived: DataFrame,
    gateway: DataFrame,
    pkt_limit: int = 20,
    bin_size: float = BIN_SIZE_SECONDS,
    range_bucket_seconds: float = 60.0,
) -> DataFrame:
    """``gateway``: un-keyed stream with (ts_sec, n_chars)."""
    sliced = gated_first_k(derived, pkt_limit).select(S.CONV, S.TS_SEC, S.N_CHARS)
    sliced = sliced.withColumn("_bin", time_bucket(S.TS_SEC, bin_size))
    gw = gateway.select(
        time_bucket(S.TS_SEC, bin_size).alias("_bin"),
        F.col(S.N_CHARS).cast("double").alias("_len"),
    )

    gw_bins = gw.groupBy("_bin").agg(F.sum("_len").alias("gw_len"))
    # ONE pre-aggregate feeds both the bin table and the span table —
    # the expensive gated-first-K window pass over the full data runs
    # once. conn_pre is bounded (≤ pkt_limit rows per conversation), so
    # materializing it is cheap and breaks the recompute diamond (its
    # two consumers prune different columns, which defeats exchange
    # reuse). localCheckpoint, NOT persist: persisted plans pin cache
    # entries in the CacheManager for the application lifetime (a
    # long-lived driver calling this per batch would leak executor
    # storage), while checkpoint blocks are released by the
    # ContextCleaner once the DataFrame is unreferenced.
    conn_pre = (
        sliced.groupBy(S.CONV, "_bin")
        .agg(
            F.sum(F.col(S.N_CHARS).cast("double")).alias("rl_len"),
            F.min(S.TS_SEC).alias("_bmin"),
            F.max(S.TS_SEC).alias("_bmax"),
        )
        .localCheckpoint(eager=False)
    )
    conn_bins = conn_pre.select(S.CONV, "_bin", "rl_len")
    spans = conn_pre.groupBy(S.CONV).agg(
        F.min("_bmin").alias("_tmin"),
        (F.max("_bmax") + F.lit(1.0)).alias("_tmax1"),
    )

    # gateway bins falling inside [tmin, tmax + 1.0] per conversation
    slice_rows = interval_join(
        spans,
        gw_bins.withColumnRenamed("_bin", "_gbin"),
        point_ts="_gbin",
        span_start="_tmin",
        span_end="_tmax1",
        bucket_seconds=range_bucket_seconds,
    ).select(S.CONV, F.col("_gbin").alias("_bin"), "gw_len")

    merged = (
        slice_rows.join(conn_bins, [S.CONV, "_bin"], "full_outer")
        .withColumn("_has_gw", F.col("gw_len").isNotNull())
        .withColumn("gw_len", F.coalesce("gw_len", F.lit(0.0)))
        .withColumn("rl_len", F.coalesce("rl_len", F.lit(0.0)))
    )

    # two-pass z-product, all JVM-side: per-conv mean/std window (no
    # order → one hash partition by conv), then a single groupBy with
    # the 9 statistics (exact percentile = numpy median). A kernel-based
    # variant was profiled 3× SLOWER at 1M turns — the Arrow transfer of
    # the ~13×-fanned-out merged table dominates; keep it in the JVM.
    from pyspark.sql import Window

    wc = Window.partitionBy(S.CONV)
    eps = F.lit(1e-9)
    z = (
        (F.col("gw_len") - F.avg("gw_len").over(wc)) / (F.stddev_pop("gw_len").over(wc) + eps)
    ) * (
        (F.col("rl_len") - F.avg("rl_len").over(wc)) / (F.stddev_pop("rl_len").over(wc) + eps)
    )
    stats = (
        merged.withColumn("_z", z)
        .groupBy(S.CONV)
        .agg(
            F.count("_z").cast("int").alias("corr_count"),
            F.sum("_z").alias("corr_sum"),
            F.avg("_z").alias("corr_mean"),
            F.expr("percentile(_z, 0.5)").alias("corr_median"),
            F.min("_z").alias("corr_minimum"),
            F.max("_z").alias("corr_maximum"),
            (F.max("_z") - F.min("_z")).alias("corr_range"),
            F.var_pop("_z").alias("corr_variance"),
            F.stddev_pop("_z").alias("corr_std_dev"),
            F.max(F.col("_has_gw").cast("int")).alias("_cov"),
        )
    )

    # conversations with an empty gateway slice → all-zero metrics
    # (reference short-circuit, corr_extractor.py:89-90). Every gated
    # conversation reaches `stats` through the conn side of the
    # full-outer join, so coverage is just the aggregated _has_gw flag —
    # no anti/semi-join re-reading slice_rows (which is the largest
    # intermediate in the plan).
    covered = F.col("_cov") == 1
    return stats.select(
        S.CONV,
        F.when(covered, F.col("corr_count")).otherwise(F.lit(0)).alias("corr_count"),
        *[
            F.when(covered, F.col(c)).otherwise(F.lit(0.0)).alias(c)
            for c in CORR_NAMES[1:]
        ],
    )
