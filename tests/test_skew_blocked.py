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
