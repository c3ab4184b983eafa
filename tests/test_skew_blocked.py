"""Blocked (skew-split) order-dependent operators equal their plain
window forms — with block sizes small enough that every conversation
spans many blocks."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

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


def test_salted_join_keeps_null_salt_rows(spark):
    """Review regression: a NULL salt_col row must survive the salted
    join exactly like the plain join (pmod(NULL) previously never
    matched the replicated dim side)."""
    from proxyfeatureextraction_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [("k1", 1, 10.0), ("k1", None, 20.0)],
        "conv_id string, turn_idx int, v double",
    )
    dim = spark.createDataFrame([("k1", "d")], "conv_id string, tag string")
    for how in ("inner", "left"):
        got = salted_join(fact, dim, key="conv_id", salt=4,
                          salt_col="turn_idx", how=how)
        exp = fact.join(dim, "conv_id", how)
        assert got.count() == exp.count() == 2
        assert got.filter(F.col("tag").isNull()).count() == 0


def test_blocked_prefix_sum_all_null_block_matches_plain(spark):
    """Review regression: a block whose prefix is all-NULL must carry
    the previous blocks' sum, exactly like the plain window path."""
    from proxyfeatureextraction_spark.operators.skew import blocked_prefix_sum
    from proxyfeatureextraction_spark.operators.windows import prefix_sum

    rows = [("c", i, v) for i, v in enumerate([1.0, 1.0, 1.0, None, None, None, 2.0])]
    rows += [("d", i, v) for i, v in enumerate([None, None, 5.0])]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, val double")
    got = (
        blocked_prefix_sum(df, "val", "cum", block_rows=3)
        .select("conv_id", "turn_idx", "cum")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        prefix_sum(df, "val", "cum", order_cols=("turn_idx",))
        .select("conv_id", "turn_idx", "cum")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_salted_stats_all_null_key_keeps_null_variance(spark):
    """Review regression: an all-NULL key must report NULL var/std like
    the plain F.var_pop oracle, not 0.0."""
    from proxyfeatureextraction_spark.operators.skew import salted_stats

    df = spark.createDataFrame(
        [("c1", 1, None), ("c1", 2, None), ("c2", 1, 3.0)],
        "conv_id string, turn_idx int, v double",
    )
    out = salted_stats(df, "v", salt=4, key="conv_id").toPandas().set_index("conv_id")
    assert out.loc["c1", "count"] == 0
    assert pd.isna(out.loc["c1", "var_pop"]) and pd.isna(out.loc["c1", "std_pop"])
    assert out.loc["c2", "var_pop"] == 0.0
