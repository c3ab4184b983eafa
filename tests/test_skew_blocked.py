"""Blocked (skew-split) order-dependent operators equal their plain
window forms — with block sizes small enough that every conversation
spans many blocks."""

from __future__ import annotations

import numpy as np

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators import skew, windows
from proxyfeatureextraction_spark.schema import with_derived


def test_blocked_prefix_sum_equals_window(spark, transcripts_df):
    d = with_derived(transcripts_df)
    plain = windows.prefix_sum(d, S.N_CHARS).select(S.CONV, S.TURN, "cum_n_chars")
    blocked = skew.blocked_prefix_sum(d, S.N_CHARS, "cum_blocked", block_rows=7).select(
        S.CONV, S.TURN, "cum_blocked"
    )
    j = plain.join(blocked, [S.CONV, S.TURN]).toPandas()
    np.testing.assert_allclose(
        j["cum_n_chars"].astype(float), j["cum_blocked"].astype(float), rtol=1e-12
    )


def test_blocked_sessionize_equals_window(spark, transcripts_df):
    d = with_derived(transcripts_df)
    plain = windows.sessionize(d, gap_seconds=300.0).select(S.CONV, S.TURN, "session_id")
    blocked = skew.blocked_sessionize(
        d, gap_seconds=300.0, out="session_blocked", block_rows=5
    ).select(S.CONV, S.TURN, "session_blocked")
    j = plain.join(blocked, [S.CONV, S.TURN]).toPandas()
    assert (j["session_id"] == j["session_blocked"]).all()
    assert j["session_id"].max() > 0


def test_blocked_partition_bound(spark, transcripts_df):
    """No stage in the blocked plan windows over an unbounded (key)-only
    partition of the row table: within-block windows partition by
    (key, block), and the offset window runs over per-block totals."""
    d = with_derived(transcripts_df)
    plan = (
        skew.blocked_prefix_sum(d, S.N_CHARS, "c", block_rows=7)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    # within-block window mentions _blk in its partition spec
    assert "_blk" in plan


def test_salted_join_equals_plain_join(spark):
    """Row-for-row parity with the plain join on a skewed corpus (one
    key holds 80% of fact rows), for inner and left, with both salt
    sources (stable column and whole-row hash)."""
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.operators.skew import salted_join

    fact = spark.range(5000).select(
        F.when(F.col("id") < 4000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
        ).alias("conv_id"),
        F.col("id").alias("turn_idx"),
        (F.col("id") * 3 % 101).alias("v"),
    )
    # dim misses some fact keys so 'left' exercises null preservation
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(0, 37, 2)],
        "conv_id string, w double",
    )
    for how in ("inner", "left"):
        exp = {
            (r.conv_id, r.turn_idx, r.v, r.w)
            for r in fact.join(dim, "conv_id", how).collect()
        }
        for kw in ({"salt_col": "turn_idx"}, {}):
            got = {
                (r.conv_id, r.turn_idx, r.v, r.w)
                for r in salted_join(fact, dim, salt=8, how=how, **kw).collect()
            }
            assert got == exp, (how, kw)
    import pytest as _pt

    with _pt.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, how="full")


def test_salted_join_spreads_hot_key(spark):
    """Mechanics: the hot key's fact rows really land in `salt` distinct
    sub-keys, and the join keys include the salt (plan audit)."""
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.operators.skew import salted_join

    fact = spark.range(4000).select(
        F.lit("hot").alias("conv_id"), F.col("id").alias("turn_idx")
    )
    dim = spark.createDataFrame([("hot", 1)], "conv_id string, w int")
    n_sub = (
        fact.withColumn("_salt", F.pmod(F.col("turn_idx"), F.lit(8)))
        .select("_salt").distinct().count()
    )
    assert n_sub == 8
    out = salted_join(fact, dim, salt=8, salt_col="turn_idx")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    assert out.count() == 4000
