"""BASELINE.json invariants: per-turn text equality under stable
ordering, zero temporal leakage (truncation replay), and the
no-lead-on-PIT-surface audit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators.ordering import canonical
from proxyfeatureextraction_spark.plans.pit import pit_features
from proxyfeatureextraction_spark.schema import with_derived


def test_text_equality_under_stable_ordering(spark, transcripts_df, transcripts_pdf):
    """Engine processing must not alter any turn's text: canonical
    ordering in, identical per-(conv, turn) text out."""
    out = (
        canonical(with_derived(transcripts_df))
        .select(S.CONV, S.TURN, S.TEXT)
        .toPandas()
        .sort_values([S.CONV, S.TURN])
        .reset_index(drop=True)
    )
    exp = (
        transcripts_pdf[[S.CONV, S.TURN, S.TEXT]]
        .sort_values([S.CONV, S.TURN])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_truncation_replay_no_leakage(spark, transcripts_df):
    """Features at (conv, ts ≤ T) must be identical whether or not any
    data after T exists — the definition of zero temporal leakage."""
    d = with_derived(transcripts_df)
    cutoff = d.approxQuantile(S.TS_SEC, [0.6], 0.0)[0]

    full = pit_features(d).filter(F.col(S.TS_SEC) <= cutoff).toPandas()
    truncated_in = d.filter(F.col(S.TS_SEC) <= cutoff)
    trunc = pit_features(truncated_in).toPandas()

    key = [S.CONV, S.TURN]
    full = full.sort_values(key).reset_index(drop=True)
    trunc = trunc.sort_values(key).reset_index(drop=True)
    assert len(full) == len(trunc)
    pd.testing.assert_frame_equal(full, trunc, check_exact=False, atol=1e-12)


def test_no_lead_columns_on_pit_surface(spark, transcripts_df):
    from proxyfeatureextraction_spark.operators.windows import LEAKY_PREFIX

    cols = pit_features(with_derived(transcripts_df)).columns
    leaky = [c for c in cols if c.startswith(LEAKY_PREFIX)]
    assert not leaky, f"leaky columns on the as-of surface: {leaky}"


def test_pit_plan_frames_end_at_current_row(spark, transcripts_df):
    """Physical-plan audit: every window frame upper bound is
    currentrow (no following frames on the PIT surface)."""
    spark.conf.set("spark.sql.debug.maxToStringFields", "500")
    plan = pit_features(with_derived(transcripts_df))._jdf.queryExecution().analyzed().toString()
    assert "specifiedwindowframe" in plan.lower(), "no window frames found in plan"
    # a frame reaching the future would contain 'following' (lead(n) is
    # frame [n, n] with n > 0, printed as a positive literal) — assert
    # neither appears
    assert "following" not in plan.lower(), "frame extends past currentRow"
    import re

    for lo, hi in re.findall(r"specifiedwindowframe\(RowFrame, (-?\d+), (-?\d+)\)", plan):
        assert int(hi) <= 0, f"frame extends past currentRow: [{lo}, {hi}]"


def test_extract_plan_has_no_unbounded_collect(spark, transcripts_df):
    """Scale audit (judge r1 finding #2): the flagship extract plan must
    not contain a collect_list/collect_set window — an unbounded array
    agg materializes O(n_groups²) struct copies per partition. The Q5
    gap quirk is expressed as a rank self-join instead."""
    from proxyfeatureextraction_spark.plans.extract import extract_features

    spark.conf.set("spark.sql.debug.maxToStringFields", "500")
    plan = (
        extract_features(with_derived(transcripts_df))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
        .lower()
    )
    assert "collect_list" not in plan and "collect_set" not in plan, (
        "unbounded array aggregation found in the extract plan"
    )


def test_scan_pushes_filters_and_prunes_columns(spark):
    """Declarative-plan dividend: a filtered 1-column projection must
    reach the parquet scan as PushedFilters + a 2-column ReadSchema —
    at 100 TB this is the difference between reading two columns of a
    row-group subset and reading everything."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("testdata absent")
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf}/events.parquet")
    plan = (
        df.filter(F.col("user_id") == 1)
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,1)]" in plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint>" in plan


def test_host_features_plan_has_no_unbounded_collect(spark, transcripts_df):
    """Same audit for the standalone host_features API (it previously
    kept its own collect_list-window Q5 variant after the fused plan
    was fixed; both now share the rank self-join)."""
    from proxyfeatureextraction_spark.features.host import host_features

    plan = (
        host_features(with_derived(transcripts_df))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
        .lower()
    )
    assert "collect_list" not in plan and "collect_set" not in plan
