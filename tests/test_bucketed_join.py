"""Bucketed co-located joins: the table-layout answer to fact-fact
shuffles at 100 TB. Broadcast is disabled inside these tests — at real
scale BOTH sides of a fact-fact join exceed any broadcast threshold,
which is exactly when bucketing matters; the differential assertion
(same join, with/without bucket metadata, loses/keeps its shuffle
Exchanges) is the point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_pair(spark, transcripts_df):
    """Transcript turns + per-conv aggregate, both bucketed by conv_id
    with the same bucket count."""
    import shutil

    for t in ("t_turns", "t_convs"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a crashed prior run can orphan the managed location without a
        # catalog entry; saveAsTable refuses to reuse it
        shutil.rmtree(f"/tmp/pfx-warehouse/{t}", ignore_errors=True)
    write_bucketed(transcripts_df, "t_turns", buckets=8, bucket_cols=("conv_id",))
    agg = transcripts_df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    write_bucketed(agg, "t_convs", buckets=8, bucket_cols=("conv_id",))
    return read_bucketed(spark, "t_turns"), read_bucketed(spark, "t_convs")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, no_broadcast, bucketed_pair):
    turns, convs = bucketed_pair
    joined = turns.join(convs, "conv_id")
    plan = _plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan, plan
    # and it is a real join of both scans, not a rewrite
    assert joined.count() == turns.count()


def test_unbucketed_same_join_shuffles(spark, no_broadcast, transcripts_df, tmp_path):
    """Differential control: the identical join over path-read parquet
    (no bucketing metadata) must shuffle both sides."""
    p = str(tmp_path / "plain")
    transcripts_df.write.parquet(p)
    plain = spark.read.parquet(p)
    agg = plain.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    plan = _plan(plain.join(agg, "conv_id"))
    assert "Exchange hashpartitioning" in plan


def test_bucketed_groupby_on_bucket_key_has_no_shuffle(spark, no_broadcast, bucketed_pair):
    """Aggregation on the bucket key also rides the layout: no shuffle."""
    turns, _ = bucketed_pair
    agg = turns.groupBy("conv_id").agg(F.sum(F.length("text")).alias("chars"))
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_values_match_plain_join(spark, no_broadcast, bucketed_pair, transcripts_df):
    turns, convs = bucketed_pair
    got = (
        turns.join(convs, "conv_id")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("n_turns").alias("m"))
    )
    exp = (
        transcripts_df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("m", F.col("n"))
    )
    gp = {(r.conv_id, r.n, r.m) for r in got.collect()}
    ep = {(r.conv_id, r.n, r.m) for r in exp.collect()}
    assert gp == ep
