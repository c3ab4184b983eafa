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
