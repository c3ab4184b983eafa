"""Property tests for the seeded transform stage (reference tests the
same properties with monkeypatched RNG, test_preprcessing.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators import transforms as TR
from proxyfeatureextraction_spark.schema import with_derived


@pytest.fixture(scope="module")
def base(transcripts_pdf):
    return transcripts_pdf


def _run(spark, df, chain, seed=42):
    return TR.apply_transforms(df, chain, run_seed=seed).toPandas()


def test_deterministic_and_layout_invariant(spark, transcripts_df):
    chain = [TR.targeted_padding(), TR.ipd_jitter(), TR.reshaping()]
    a = _run(spark, transcripts_df, chain).sort_values([S.CONV, S.TURN]).reset_index(drop=True)
    b = _run(spark, transcripts_df.repartition(7), chain).sort_values(
        [S.CONV, S.TURN]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    c = _run(spark, transcripts_df, chain, seed=7).sort_values([S.CONV, S.TURN]).reset_index(
        drop=True
    )
    assert not a[S.TS].equals(c[S.TS])


def test_reshaping_conserves_chars(spark, transcripts_df, transcripts_pdf):
    out = _run(spark, transcripts_df, [TR.reshaping()])
    before = transcripts_pdf.assign(n=transcripts_pdf[S.TEXT].str.len()).groupby(S.CONV)["n"].sum()
    after = out.assign(n=out[S.TEXT].str.len()).groupby(S.CONV)["n"].sum()
    pd.testing.assert_series_equal(before.sort_index(), after.sort_index(), check_names=False)
    # no split segment below the min size, splits only above threshold
    assert (out[S.TEXT].str.len() >= 1).all()


def test_padding_bounds(spark, transcripts_df, transcripts_pdf):
    out = _run(spark, transcripts_df, [TR.targeted_padding(n_turns=5, pad_size=64)])
    srt = transcripts_pdf.sort_values([S.CONV, S.TURN])
    counts = srt.groupby(S.CONV).size()
    eligible = counts[counts >= 20].index
    merged = out.merge(
        srt[[S.CONV, S.TURN, S.TEXT]], on=[S.CONV, S.TURN], suffixes=("_a", "_b")
    )
    delta = merged[S.TEXT + "_a"].str.len() - merged[S.TEXT + "_b"].str.len()
    in_scope = merged[S.CONV].isin(eligible) & (merged[S.TURN] < 5)
    assert ((delta[in_scope] >= 1) & (delta[in_scope] <= 64)).all()
    assert (delta[~in_scope] == 0).all()


def test_jitter_monotonic_and_gated(spark, transcripts_df, transcripts_pdf):
    out = _run(spark, transcripts_df, [TR.ipd_jitter(n_turns=5, max_delay_s=0.5)])
    for _, g in out.sort_values([S.CONV, S.TURN]).groupby(S.CONV):
        assert g[S.TS].is_monotonic_increasing
    counts = transcripts_pdf.groupby(S.CONV).size()
    small = counts[counts < 20].index
    untouched = out[out[S.CONV].isin(small)].sort_values([S.CONV, S.TURN])
    orig = (
        transcripts_pdf[transcripts_pdf[S.CONV].isin(small)]
        .sort_values([S.CONV, S.TURN])
    )
    assert untouched[S.TS].tolist() == orig[S.TS].tolist()


def test_bias_removal_drops_big_fourth(spark, transcripts_df, transcripts_pdf):
    out = _run(spark, transcripts_df, [TR.bias_removal({"empirical_lengths": [100]})])
    srt = transcripts_pdf.sort_values([S.CONV, S.TURN])
    counts = srt.groupby(S.CONV).size()
    for conv, g in srt.groupby(S.CONV):
        n = counts[conv]
        got = out[out[S.CONV] == conv]
        if n >= 20 and g[S.TEXT].str.len().iloc[3] > 1300:
            assert len(got) == n - 2  # turns 4 & 6 dropped
            assert got.sort_values(S.TURN)[S.TEXT].str.len().iloc[3] == 100
        else:
            assert len(got) == n


def test_rng_is_per_conversation(spark):
    a = TR.rng_for(42, "conv_1").integers(0, 1 << 30, 4)
    b = TR.rng_for(42, "conv_1").integers(0, 1 << 30, 4)
    c = TR.rng_for(42, "conv_2").integers(0, 1 << 30, 4)
    assert (a == b).all() and not (a == c).all()
