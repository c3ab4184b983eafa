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
    # FP-negative guard ONLY when data exists: greatest(NULL, 0.0)
    # returns 0.0, which would turn an all-NULL key's variance from
    # NULL ("no data") into 0.0 ("zero spread") — keep NULL like the
    # plain F.var_pop oracle does
    var = F.when(
        F.col("count") > 0,
        F.greatest(F.col("sum_sq") / F.col("count") - mean * mean, F.lit(0.0)),
    )
    return (
        merged.withColumn("avg", mean)
        .withColumn("var_pop", var)
        .withColumn("std_pop", F.sqrt(var))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str = S.CONV,
    salt: int = 16,
    salt_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join for hot fact keys when the dim side is
    too large to broadcast (AQE's skew splitting helps sort-merge
    partitions after the fact; this prevents the hot partition from
    forming at all, and works for shuffled-hash joins too).

    The fact side salts ``key`` into ``salt`` sub-keys — deterministic:
    ``salt_col % salt`` when a stable numeric column exists (reruns are
    bit-reproducible and cluster-size-invariant, same policy as
    ``salted_stats``), else ``xxhash64(all fact columns) % salt`` —
    and the dim side replicates each row ``salt``× (array explode), so
    every (key, salt) bucket co-locates with exactly one copy of its
    dim row. Row-for-row identical to ``fact.join(dim, key, how)``.

    Cost model: dim bytes × ``salt`` extra shuffle volume buys a
    ``salt``× reduction of the hottest task — size ``salt`` to the skew
    ratio, not to the cluster. ``inner``/``left`` only (each fact row
    carries ONE salt; a right/full join would surface dim replicas).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: the dim side "
            f"is replicated, so right/full would emit {salt}× dim rows."
        )
    if salt_col is not None:
        # coalesce: pmod(NULL) is NULL, which never equi-joins the dim
        # replicas — a NULL salt_col row would silently vanish (inner)
        # or lose its dim columns (left); route NULLs to bucket 0
        sc = F.coalesce(
            F.pmod(F.col(salt_col).cast("long"), F.lit(salt)), F.lit(0)
        )
    else:
        sc = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    f = fact.withColumn("_salt", sc)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def blocked_prefix_sum(
    df: DataFrame,
    value_col: str,
    out: str,
    block_rows: int = 100_000,
    key: str = S.CONV,
    idx_col: str = S.TURN,
) -> DataFrame:
    """Skew-split running sum for ORDER-DEPENDENT state (north rule).

    A plain window prefix sum puts a whole conversation in one sorted
    task — a 10^9-turn heavy hitter stalls an executor. Split by
    contiguous turn blocks instead:

    1. within-block cumsum over (key, block) — every partition bounded
       by ``block_rows``;
    2. per-block totals (tiny: rows/block_rows per key) get a running
       offset over blocks via a second, trivially small window;
    3. final value = within-block cumsum + previous blocks' offset.

    Exactly equals ``windows.prefix_sum`` (tested), with no unbounded
    partition anywhere.
    """
    from pyspark.sql import Window

    block = F.floor(F.col(idx_col) / F.lit(block_rows)).alias("_blk")
    d = df.withColumn("_blk", block)
    win_in = (
        Window.partitionBy(key, "_blk")
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col).cast("double")
    # carry a non-null-count prefix alongside the value prefix (same
    # treatment as plans/pit._cumn_in): a window sum is NULL iff its
    # frame holds no non-null value, and NULL + _off would otherwise
    # poison every row of an all-null-prefix block — diverging from
    # the plain windows.prefix_sum this function must exactly equal
    d = d.withColumn("_within", F.sum(v).over(win_in)).withColumn(
        "_cnt_in", F.count(v).over(win_in)
    )

    totals = d.groupBy(key, "_blk").agg(
        F.sum(v).alias("_tot"), F.count(v).alias("_cnt")
    )
    win_blk = (
        Window.partitionBy(key)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        key,
        "_blk",
        F.coalesce(F.sum("_tot").over(win_blk), F.lit(0.0)).alias("_off"),
        F.coalesce(F.sum("_cnt").over(win_blk), F.lit(0)).alias("_offcnt"),
    )
    return (
        d.join(offsets, [key, "_blk"], "inner")
        .withColumn(
            out,
            F.when(
                F.col("_cnt_in") + F.col("_offcnt") > 0,
                F.coalesce(F.col("_within"), F.lit(0.0)) + F.col("_off"),
            ),
        )
        .drop("_blk", "_within", "_cnt_in", "_off", "_offcnt")
    )


def blocked_sessionize(
    df: DataFrame,
    gap_seconds: float = 300.0,
    ts_col: str = "ts_sec",
    out: str = "session_id",
    block_rows: int = 100_000,
    key: str = S.CONV,
    idx_col: str = S.TURN,
) -> DataFrame:
    """Skew-split gap-sessionization: the lag at each block boundary is
    recovered from the previous block's closing timestamp (carried
    through the tiny per-block table), then session ids are a blocked
    prefix sum of the gap flags."""
    from pyspark.sql import Window

    d = df.withColumn("_blk", F.floor(F.col(idx_col) / F.lit(block_rows)))
    win_in = Window.partitionBy(key, "_blk").orderBy(idx_col)
    d = d.withColumn("_prev_in", F.lag(ts_col, 1).over(win_in))

    closes = d.groupBy(key, "_blk").agg(F.max_by(ts_col, F.col(idx_col)).alias("_close"))
    win_blk = Window.partitionBy(key).orderBy("_blk")
    carry = closes.withColumn("_prev_close", F.lag("_close", 1).over(win_blk)).select(
        key, "_blk", "_prev_close"
    )
    d = d.join(carry, [key, "_blk"], "inner").withColumn(
        "_prev_ts", F.coalesce("_prev_in", "_prev_close")
    )
    d = d.withColumn(
        "_new",
        F.when(F.col(ts_col) - F.col("_prev_ts") > gap_seconds, 1.0).otherwise(0.0),
    )
    out_df = blocked_prefix_sum(d, "_new", out, block_rows, key, idx_col)
    return out_df.withColumn(out, F.col(out).cast("long")).drop(
        "_prev_in", "_prev_close", "_prev_ts", "_new"
    )
