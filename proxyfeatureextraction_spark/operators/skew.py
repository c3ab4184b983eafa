"""Heavy-hitter handling for per-conversation aggregation (north rule).

AQE's skew-join splitting rebalances sort-merge JOIN partitions only;
it does nothing for ``groupBy(conv_id)`` / grouped-kernel skew. The
engine's mechanisms (SURVEY.md §4):

(a) first-K gates bound every first-K feature family to K rows per
    group — skew eliminated by construction (``operators.ordering``);
(b) whole-trace ALGEBRAIC aggregates go through the salted two-phase
    aggregation here: partials per (conv_id, salt), then an exact
    re-merge per conv_id. Salt is deterministic (``turn_idx % S``), so
    reruns are reproducible and cluster-size-invariant.

Order-dependent whole-trace kernels (e.g. the RTT triplet scan) cannot
be salted; they stay K-bounded or accept the group-sized task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S

# Statistics with an exact two-phase (algebraic) decomposition.
ALGEBRAIC = ("count", "sum", "min", "max", "avg", "var_pop", "std_pop", "sum_sq")


def heavy_hitters(df: DataFrame, threshold: int = 100_000, key: str = S.CONV) -> DataFrame:
    """Cheap pre-pass: conversations whose row count exceeds threshold."""
    return df.groupBy(key).count().filter(F.col("count") > threshold)


def salted_stats(
    df: DataFrame,
    value_col: str,
    salt: int = 16,
    key: str = S.CONV,
    salt_col: str = S.TURN,
) -> DataFrame:
    """Exact per-key count/sum/min/max/avg/var_pop/std_pop of
    ``value_col`` via salted two-phase aggregation.

    Phase 1 groups by (key, ``salt_col % salt``) — a heavy hitter's
    rows spread over ``salt`` tasks; phase 2 merges the algebraic
    partials (counts, sums, sums of squares, mins, maxes) per key.
    ``salt=1`` degenerates to a plain groupBy (used as the correctness
    oracle in tests).
    """
    v = F.col(value_col).cast("double")
    partial = (
        df.withColumn("_salt", F.pmod(F.col(salt_col).cast("long"), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(
            F.count(v).alias("_n"),
            F.sum(v).alias("_s"),
            F.sum(v * v).alias("_s2"),
            F.min(v).alias("_mn"),
            F.max(v).alias("_mx"),
        )
    )
    merged = partial.groupBy(key).agg(
        F.sum("_n").alias("count"),
        F.sum("_s").alias("sum"),
        F.sum("_s2").alias("sum_sq"),
        F.min("_mn").alias("min"),
        F.max("_mx").alias("max"),
    )
    mean = F.col("sum") / F.col("count")
    var = F.col("sum_sq") / F.col("count") - mean * mean
    var = F.greatest(var, F.lit(0.0))  # guard FP negatives
    return (
        merged.withColumn("avg", mean)
        .withColumn("var_pop", var)
        .withColumn("std_pop", F.sqrt(var))
    )
