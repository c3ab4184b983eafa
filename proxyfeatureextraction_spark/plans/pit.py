"""Point-in-time (as-of) per-turn feature surface.

For each (conv_id, ts) this computes backfilled lag features, session
boundaries and rolling per-role/per-tool statistics, with EVERY window
frame ending at ``currentRow`` — the zero-temporal-leakage surface the
north star specifies. ``lead``-derived columns are banned here by the
audit test (tests/test_invariants.py) and live only on the whole-trace
surfaces (RTT), flagged leaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators.ordering import ORDER_COLS

LEAKY_COLS: tuple[str, ...] = ()  # none on this surface, audited


def pit_features(
    derived: DataFrame,
    session_gap_s: float = 300.0,
    roll_rows: int = 10,
) -> DataFrame:
    w = Window.partitionBy(S.CONV).orderBy(*ORDER_COLS)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wroll = w.rowsBetween(-(roll_rows - 1), Window.currentRow)
    wrole = Window.partitionBy(S.CONV, S.ROLE).orderBy(*ORDER_COLS)

    gap = F.col(S.TS_SEC) - F.lag(S.TS_SEC, 1).over(w)
    return derived.select(
        S.CONV,
        S.TURN,
        S.TS,
        S.TS_SEC,
        S.ROLE,
        S.TOOL,
        S.DIR,
        S.N_CHARS,
        gap.alias("delta_prev"),
        (F.col(S.TS_SEC) - F.lag(S.TS_SEC, 1).over(wrole)).alias("delta_prev_same_role"),
        F.sum(F.when(gap > session_gap_s, 1).otherwise(0)).over(wcum).alias("session_id"),
        F.sum(S.N_CHARS).over(wcum).alias("cum_n_chars"),
        F.row_number().over(w).alias("turn_rank"),
        F.avg(S.N_CHARS).over(wroll).alias(f"roll_avg_chars_{roll_rows}"),
        F.sum(F.when(F.col(S.DIR) == 1, 1).otherwise(0)).over(wcum).alias("cum_user_turns"),
        F.last(F.when(F.col(S.TOOL).isNotNull(), F.col(S.TOOL)), ignorenulls=True)
        .over(wcum)
        .alias("last_tool"),
        F.last(
            F.when(F.col(S.TOOL).isNotNull(), F.col(S.TS_SEC)), ignorenulls=True
        )
        .over(wcum)
        .alias("last_tool_ts"),
    )


def pit_features_blocked(
    derived: DataFrame,
    session_gap_s: float = 300.0,
    roll_rows: int = 10,
    block_rows: int = 1_000_000,
) -> DataFrame:
    """Skew-split PIT surface — same columns/values as ``pit_features``,
    with EVERY sorted row-data partition bounded by ``block_rows``
    (north rule: a 10⁹-turn heavy-hitter conversation must not stall
    one executor behind a single window partition).

    Mechanics: rows split into contiguous turn blocks; order-dependent
    state crosses block boundaries via tiny per-block carry tables —
    close timestamps, prefix totals, last-non-null tool, the trailing
    ``roll_rows`` prefix values — joined back on (conv, block). Those
    tables have rows/block_rows entries, so AQE broadcasts them at any
    realistic heavy-subset size; the only full-data exchanges are the
    two bounded window passes (conv, blk) and (conv, role, blk).

    Exactness: prefix quantities are int64 sums (exact) and every ratio
    divides the same operands the window path divides, so outputs are
    bit-equal to ``pit_features`` (tested at block_rows=7 vs the plain
    windows). Null ``n_chars`` keeps avg/sum semantics: a non-null
    prefix count rides alongside the value prefix, the rolling divisor
    is the frame's NON-NULL count (not its row count), and both
    ``roll_avg`` and ``cum_n_chars`` go NULL exactly when their frame /
    prefix holds no non-null value. Handles ragged/empty blocks from sparse turn_idx: carries
    use the previous PRESENT block, and the rolling lookback joins by
    global row position (the target row is always within the trailing
    ``roll_rows`` rows of its own block — see test)."""
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    d = derived.withColumn("_blk", F.floor(F.col(S.TURN) / F.lit(block_rows)))
    w_in = Window.partitionBy(S.CONV, "_blk").orderBy(*ORDER_COLS)
    wcum_in = w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall_in = w_in.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_role_in = Window.partitionBy(S.CONV, S.ROLE, "_blk").orderBy(*ORDER_COLS)
    d = d.select(
        S.CONV, S.TURN, S.TS, S.TS_SEC, S.ROLE, S.TOOL, S.DIR, S.N_CHARS, "_blk",
        F.row_number().over(w_in).alias("_p"),
        F.count(F.lit(1)).over(wall_in).alias("_bn"),
        F.lag(S.TS_SEC, 1).over(w_in).alias("_lag_ts_in"),
        F.lag(S.TS_SEC, 1).over(w_role_in).alias("_lag_role_in"),
        # coalesce: a block whose prefix is all-null would otherwise
        # carry a NULL partial sum into _C / _bc; sum-is-null-iff-no-
        # non-null is re-derived at the output from the non-null count
        F.coalesce(
            F.sum(F.col(S.N_CHARS).cast("long")).over(wcum_in), zero
        ).alias("_cumc_in"),
        # non-null prefix count: avg's denominator is the NON-NULL count
        # in the frame, so the blocked division must carry it alongside
        # the value prefix or null n_chars breaks bit-equality
        F.sum(F.when(F.col(S.N_CHARS).isNotNull(), one).otherwise(zero))
        .over(wcum_in).alias("_cumn_in"),
        F.sum(F.when(F.col(S.DIR) == 1, one).otherwise(zero)).over(wcum_in).alias("_cumu_in"),
        F.last(F.when(F.col(S.TOOL).isNotNull(), F.col(S.TOOL)), ignorenulls=True)
        .over(wcum_in).alias("_lt_in"),
        F.last(F.when(F.col(S.TOOL).isNotNull(), F.col(S.TS_SEC)), ignorenulls=True)
        .over(wcum_in).alias("_ltts_in"),
    )
    d = d.withColumn("_lagC_in", F.lag("_cumc_in", roll_rows).over(w_in)).withColumn(
        "_lagN_in", F.lag("_cumn_in", roll_rows).over(w_in)
    )

    blocks = d.groupBy(S.CONV, "_blk").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max_by(S.TS_SEC, "_p").alias("_close_ts"),
        F.max("_cumc_in").alias("_bc"),
        F.max("_cumn_in").alias("_bnn"),
        F.max("_cumu_in").alias("_bu"),
        F.max_by("_lt_in", "_p").alias("_blt"),
        F.max_by("_ltts_in", "_p").alias("_bltts"),
    )
    wb = Window.partitionBy(S.CONV).orderBy("_blk")
    wbprev = wb.rowsBetween(Window.unboundedPreceding, -1)
    carries = blocks.select(
        S.CONV, "_blk",
        F.coalesce(F.sum("_n").over(wbprev), zero).alias("_boff"),
        F.coalesce(F.sum("_bc").over(wbprev), zero).alias("_coffc"),
        F.coalesce(F.sum("_bnn").over(wbprev), zero).alias("_coffn"),
        F.coalesce(F.sum("_bu").over(wbprev), zero).alias("_coffu"),
        F.lag("_close_ts", 1).over(wb).alias("_prev_close"),
        F.last("_blt", ignorenulls=True).over(wbprev).alias("_carry_lt"),
        F.last("_bltts", ignorenulls=True).over(wbprev).alias("_carry_ltts"),
    )
    # null-safe role key for the carry JOIN: the plain path's window
    # partitionBy(role) groups NULL roles together, but an equi-join on
    # role would drop NULL-role rows entirely (NULL != NULL) — the two
    # pit paths must agree row-for-row
    d = d.withColumn("_rkey", F.coalesce(F.col(S.ROLE), F.lit("\x00<null-role>")))
    rblocks = d.groupBy(S.CONV, "_rkey", "_blk").agg(
        F.max_by(S.TS_SEC, "_p").alias("_rclose")
    )
    wrb = Window.partitionBy(S.CONV, "_rkey").orderBy("_blk")
    rcarry = rblocks.select(
        S.CONV, "_rkey", "_blk", F.lag("_rclose", 1).over(wrb).alias("_rprev")
    )

    d = d.join(carries, [S.CONV, "_blk"]).join(rcarry, [S.CONV, "_rkey", "_blk"])
    gap = F.col(S.TS_SEC) - F.coalesce("_lag_ts_in", "_prev_close")
    d = d.withColumn("_gap", gap).withColumn(
        "_flag", F.when(F.col("_gap") > session_gap_s, one).otherwise(zero)
    )
    # session flags need the carried close ts, so their prefix runs as a
    # second pass over the same (conv, blk) exchange + a tiny offset table
    d = d.withColumn("_sf_in", F.sum("_flag").over(wcum_in))
    soff = (
        d.groupBy(S.CONV, "_blk")
        .agg(F.max("_sf_in").alias("_bs"))
        .select(S.CONV, "_blk", F.coalesce(F.sum("_bs").over(wbprev), zero).alias("_soff"))
    )
    d = d.join(soff, [S.CONV, "_blk"])
    d = d.withColumn("_pos", F.col("_boff") + F.col("_p")).withColumn(
        "_C", F.col("_coffc") + F.col("_cumc_in")
    ).withColumn("_N", F.col("_coffn") + F.col("_cumn_in"))
    # rolling sum of the last roll_rows chars = C(i) − C(i−roll_rows);
    # the lookback row for a block's first roll_rows rows lives in the
    # trailing roll_rows rows of an EARLIER block — joined by position
    tail = d.filter(F.col("_bn") - F.col("_p") < roll_rows).select(
        F.col(S.CONV).alias("_tk"), F.col("_pos").alias("_tpos"),
        F.col("_C").alias("_tC"), F.col("_N").alias("_tN"),
    )
    d = d.withColumn("_tgt", F.col("_pos") - roll_rows).join(
        tail,
        (F.col(S.CONV) == F.col("_tk")) & (F.col("_tgt") == F.col("_tpos")),
        "left",
    )
    c_back = F.when(
        F.col("_p") > roll_rows, F.col("_coffc") + F.col("_lagC_in")
    ).otherwise(F.col("_tC"))
    n_back = F.when(
        F.col("_p") > roll_rows, F.col("_coffn") + F.col("_lagN_in")
    ).otherwise(F.col("_tN"))
    nn = F.col("_N") - F.coalesce(n_back, zero)
    # avg semantics: NULL when the frame holds no non-null n_chars
    roll_avg = F.when(nn > 0, (F.col("_C") - F.coalesce(c_back, zero)) / nn)
    return d.select(
        S.CONV, S.TURN, S.TS, S.TS_SEC, S.ROLE, S.TOOL, S.DIR, S.N_CHARS,
        F.col("_gap").alias("delta_prev"),
        (F.col(S.TS_SEC) - F.coalesce("_lag_role_in", "_rprev")).alias(
            "delta_prev_same_role"
        ),
        (F.col("_soff") + F.col("_sf_in")).alias("session_id"),
        F.when(F.col("_N") > 0, F.col("_C")).alias("cum_n_chars"),
        (F.col("_boff") + F.col("_p")).cast("int").alias("turn_rank"),
        roll_avg.alias(f"roll_avg_chars_{roll_rows}"),
        (F.col("_coffu") + F.col("_cumu_in")).alias("cum_user_turns"),
        F.coalesce("_lt_in", "_carry_lt").alias("last_tool"),
        F.coalesce("_ltts_in", "_carry_ltts").alias("last_tool_ts"),
    )


def pit_features_auto(
    derived: DataFrame,
    session_gap_s: float = 300.0,
    roll_rows: int = 10,
    heavy_threshold: int = 5_000_000,
    block_rows: int = 1_000_000,
) -> DataFrame:
    """North-rule router: conversations above ``heavy_threshold`` turns
    take the blocked skew-split path, the rest the plain window path;
    results are unioned (identical schemas/values either way). The
    heavy-hitter list is one cheap count pre-pass and is broadcast —
    heavy keys are few by definition (at 10¹² turns, even 10⁴ convs of
    10⁸ turns broadcast as a trivial list)."""
    from proxyfeatureextraction_spark.operators.skew import heavy_hitters

    heavy = heavy_hitters(derived, threshold=heavy_threshold).select(S.CONV)
    normal = derived.join(F.broadcast(heavy), S.CONV, "left_anti")
    hot = derived.join(F.broadcast(heavy), S.CONV, "left_semi")
    return pit_features(normal, session_gap_s, roll_rows).unionByName(
        pit_features_blocked(hot, session_gap_s, roll_rows, block_rows)
    )
