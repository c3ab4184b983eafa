"""Skew-split PIT surface: pit_features_blocked must be BIT-EQUAL to
the plain window pit_features (north rule: heavy-hitter conversations
are split into bounded blocks and re-merged with no value drift)."""

from __future__ import annotations

import pandas as pd
import pytest

from proxyfeatureextraction_spark.plans.pit import (
    pit_features,
    pit_features_auto,
    pit_features_blocked,
)
from proxyfeatureextraction_spark.schema import with_derived


@pytest.fixture(scope="module")
def derived(spark):
    from proxyfeatureextraction_spark.synth import synth_transcripts

    return with_derived(synth_transcripts(spark, n_convs=40, seed=7)).cache()


def _collect(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return pdf.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _assert_bit_equal(a: pd.DataFrame, b: pd.DataFrame) -> None:
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_blocked_equals_windowed(spark, derived):
    # block_rows=7 forces many blocks per conversation — every carry
    # (close ts, prefix totals, last-tool, rolling lookback) crosses
    # boundaries repeatedly
    plain = _collect(pit_features(derived))
    blocked = _collect(pit_features_blocked(derived, block_rows=7))
    _assert_bit_equal(plain, blocked)


def test_blocked_handles_sparse_turn_idx(spark):
    """Ragged/EMPTY blocks: turn_idx with large gaps makes floor-based
    blocks skip indices entirely; carries must use the previous PRESENT
    block and the rolling lookback must reach across empty blocks."""
    rows = []
    for c in ("a", "b"):
        for j, t in enumerate([0, 1, 2, 40, 41, 95, 200, 201, 202, 450]):
            rows.append((c, t, "user" if j % 2 else "assistant",
                         "x" * (j + 1), "search" if j % 4 == 0 else None,
                         float(j) * 120.0))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_sec double"
    )
    d = df.selectExpr(
        "conv_id", "turn_idx", "timestamp(ts_sec) AS ts", "ts_sec", "role", "tool",
        "CASE WHEN role = 'user' THEN 1 ELSE -1 END AS dir",
        "length(text) AS n_chars",
    )
    plain = _collect(pit_features(d, session_gap_s=150.0, roll_rows=3))
    blocked = _collect(pit_features_blocked(d, session_gap_s=150.0, roll_rows=3, block_rows=10))
    _assert_bit_equal(plain, blocked)


def test_blocked_extreme_edges(spark):
    """block_rows=1 (every row its own block: ALL state crosses a
    boundary at EVERY row) over pathological conversations: single-row,
    tied timestamps (turn_idx breaks the ORDER_COLS tie), no tool ever,
    roll window longer than the conversation."""
    rows = [
        # single-row conversation
        ("s", 0, "user", "only", None, 0.0),
        # tied timestamps, tool never set
        ("t", 0, "user", "a", None, 5.0),
        ("t", 1, "assistant", "bb", None, 5.0),
        ("t", 2, "user", "ccc", None, 5.0),
        # short conversation vs roll_rows=10
        ("u", 0, "assistant", "x", "calc", 1.0),
        ("u", 1, "assistant", "yy", None, 900.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_sec double"
    )
    d = df.selectExpr(
        "conv_id", "turn_idx", "timestamp(ts_sec) AS ts", "ts_sec", "role", "tool",
        "CASE WHEN role = 'user' THEN 1 ELSE -1 END AS dir",
        "length(text) AS n_chars",
    )
    plain = _collect(pit_features(d, session_gap_s=300.0, roll_rows=10))
    blocked = _collect(pit_features_blocked(d, session_gap_s=300.0, roll_rows=10, block_rows=1))
    _assert_bit_equal(plain, blocked)


def test_blocked_null_n_chars_matches_avg_semantics(spark):
    """Null n_chars must keep avg/sum window semantics: roll_avg divides
    by the frame's NON-NULL count (F.avg), cum_n_chars is NULL exactly
    while the prefix holds no non-null value. Topologies: leading nulls,
    an entire all-null block mid-conversation, an all-null conversation,
    and nulls straddling block boundaries."""
    rows = [
        # leading nulls then values
        ("a", 0, "user", None, None, 0.0),
        ("a", 1, "assistant", None, None, 10.0),
        ("a", 2, "user", "xxx", None, 20.0),
        ("a", 3, "assistant", "yy", "calc", 30.0),
        # all-null middle block (block_rows=2 → turns 2,3 form a block)
        ("b", 0, "user", "aaaa", None, 0.0),
        ("b", 1, "assistant", "bb", None, 10.0),
        ("b", 2, "user", None, None, 20.0),
        ("b", 3, "assistant", None, None, 30.0),
        ("b", 4, "user", "cccccc", None, 40.0),
        # entirely null conversation
        ("c", 0, "user", None, None, 0.0),
        ("c", 1, "assistant", None, None, 500.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_sec double"
    )
    d = df.selectExpr(
        "conv_id", "turn_idx", "timestamp(ts_sec) AS ts", "ts_sec", "role", "tool",
        "CASE WHEN role = 'user' THEN 1 ELSE -1 END AS dir",
        "length(text) AS n_chars",
    )
    plain = _collect(pit_features(d, session_gap_s=300.0, roll_rows=3))
    for br in (1, 2, 100):
        blocked = _collect(
            pit_features_blocked(d, session_gap_s=300.0, roll_rows=3, block_rows=br)
        )
        _assert_bit_equal(plain, blocked)
    # pin the semantics themselves, not just path parity
    c_rows = plain[plain["conv_id"] == "c"]
    assert c_rows["roll_avg_chars_3"].isna().all()
    assert c_rows["cum_n_chars"].isna().all()
    a_rows = plain[plain["conv_id"] == "a"].reset_index(drop=True)
    assert a_rows.loc[0, "cum_n_chars"] != a_rows.loc[0, "cum_n_chars"] or pd.isna(
        a_rows.loc[0, "cum_n_chars"]
    )
    # row 3 of 'a': frame = rows 1..3 → non-null values {3, 2} → avg 2.5
    assert a_rows.loc[3, "roll_avg_chars_3"] == 2.5


def test_auto_routes_and_matches(spark, derived):
    """With a tiny threshold some conversations go blocked, the rest
    windowed; the union must equal the all-windowed surface."""
    plain = _collect(pit_features(derived))
    auto = _collect(pit_features_auto(derived, heavy_threshold=30, block_rows=11))
    _assert_bit_equal(plain, auto)


def test_blocked_plan_has_no_unbounded_conv_window(spark, derived):
    """Plan audit: every row-data window partitions by (conv, block) —
    no sorted partition spans a whole conversation. The only windows
    partitioned by conv alone run over the per-block carry tables
    (rows/block_rows entries), which is the point of the design."""
    plan = (
        pit_features_blocked(derived, block_rows=7)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    import re

    for frame in re.findall(r"windowspecdefinition\(([^)]*)\)", plan.lower()):
        if "_blk" not in frame:
            # conv-only windows are allowed ONLY over carry aggregates
            assert "_n" in frame or "_b" in frame or "_rclose" in frame or "_blk" in frame


def test_blocked_keeps_null_role_rows(spark):
    """Review regression: the blocked path's per-role carry join must
    not drop NULL-role rows — the plain window path groups NULL roles
    together, and the two paths must agree row-for-row."""
    rows = [
        ("a", 0, "user", "aaaa", None, 0.0),
        ("a", 1, None, "bb", None, 10.0),
        ("a", 2, None, "cc", None, 20.0),
        ("a", 3, "user", "dddd", None, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_sec double"
    )
    d = df.selectExpr(
        "conv_id", "turn_idx", "timestamp(ts_sec) AS ts", "ts_sec", "role", "tool",
        "CASE WHEN role = 'user' THEN 1 ELSE -1 END AS dir",
        "length(text) AS n_chars",
    )
    plain = _collect(pit_features(d, session_gap_s=300.0, roll_rows=3))
    assert len(plain) == 4
    for br in (1, 2, 100):
        blocked = _collect(
            pit_features_blocked(d, session_gap_s=300.0, roll_rows=3, block_rows=br)
        )
        assert len(blocked) == 4, f"block_rows={br} dropped null-role rows"
        pd.testing.assert_frame_equal(plain, blocked)
