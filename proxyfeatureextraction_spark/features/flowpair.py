"""Flow-pair tensor corpus (W10 / SURVEY §3.3).

Reference: ``dl_experiments.py:412-491`` builds, per connection, the
first-K ``(size, ts, direction)`` rows zero-padded to (K, 3), paired
with the gateway rows inside the connection's [min_ts, max_ts]
interval (same shape). Spark-first: ordered ``collect_list`` over the
first-K slice + ``array_repeat`` padding; the gateway side comes from
the bucketed interval join — no per-connection Python.

Output: one row per conversation with two (K, 3) nested arrays
(``ArrayType(ArrayType(Double))``) — directly convertible to training
tensors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators.asof import interval_join
from proxyfeatureextraction_spark.operators.ordering import gated_first_k


def _pad_rows(col: F.Column, k: int) -> F.Column:
    """slice to k rows and zero-pad: [[size, ts, dir], ...] → (k, 3)."""
    zeros = F.array_repeat(
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0)), k
    )
    return F.slice(F.concat(col, zeros), 1, k)


def flow_pairs(
    derived: DataFrame,
    gateway: DataFrame,
    k: int = 50,
    bucket_seconds: float = 60.0,
) -> DataFrame:
    """(conv_id, flow [k][3], gw_flow [k][3], n_flow, n_gw).

    direction uses the first-sender rule (``dl_experiments.py:439-446``):
    +1 iff the turn's role equals the conversation's first role.
    """
    sliced = gated_first_k(derived, k)
    # shared first-sender rule (schema.dir_from_first_role) — a private
    # copy here could drift from the SLT side's direction convention
    sliced = sliced.withColumn(
        "_fdir", S.dir_from_first_role().cast("double")
    )
    triple = F.struct(
        F.col(S.TURN).alias("o"),
        F.array(
            F.col(S.N_CHARS).cast("double"),
            F.col(S.TS_SEC),
            F.col("_fdir"),
        ).alias("v"),
    )
    conv_rows = (
        sliced.groupBy(S.CONV)
        .agg(
            F.array_sort(F.collect_list(triple)).alias("_rows"),
            F.min(S.TS_SEC).alias("_lo"),
            F.max(S.TS_SEC).alias("_hi"),
            F.count(F.lit(1)).alias("n_flow"),
        )
        .withColumn("flow", _pad_rows(F.transform("_rows", lambda r: r["v"]), k))
        .drop("_rows")
    )

    gw_in_span = interval_join(
        conv_rows.select(S.CONV, "_lo", "_hi"),
        gateway.select(
            F.col(S.TS_SEC).alias("_gts"), F.col(S.N_CHARS).alias("_glen")
        ),
        point_ts="_gts",
        span_start="_lo",
        span_end="_hi",
        bucket_seconds=bucket_seconds,
    )
    gw_rows = (
        gw_in_span.groupBy(S.CONV)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_gts").alias("o"),
                        F.array(
                            F.col("_glen").cast("double"), F.col("_gts"), F.lit(0.0)
                        ).alias("v"),
                    )
                )
            ).alias("_grows"),
            F.count(F.lit(1)).alias("n_gw"),
        )
        .withColumn(
            # _pad_rows slices to k itself (same as the flow column) —
            # no pre-slice needed
            "gw_flow", _pad_rows(F.transform("_grows", lambda r: r["v"]), k)
        )
        .drop("_grows")
    )
    return (
        conv_rows.join(gw_rows, S.CONV, "left")
        .withColumn("n_gw", F.coalesce("n_gw", F.lit(0)))
        .withColumn(
            "gw_flow",
            F.coalesce(
                "gw_flow", _pad_rows(F.array().cast("array<array<double>>"), k)
            ),
        )
        .select(S.CONV, "flow", "gw_flow", "n_flow", "n_gw")
    )
