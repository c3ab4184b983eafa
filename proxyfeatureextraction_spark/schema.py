"""Canonical transcript schema + derived-column factory.

Input shape per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus ingest-partition columns ``folder_name`` /
``source`` (the reference's folder-of-CSVs corpus and its three per-
folder files, ``data_io.py:53-77``, become partition/discriminator
columns).

Domain dictionary (SURVEY.md §7.4):

==================  =========================================
reference concept    engine concept
==================  =========================================
``conn``             ``conv_id``
packet               turn
``ts_relative``      ``ts_sec`` = seconds(ts − min(ts) over folder)
``pkt_len``          ``n_chars = length(text)``
direction ±1         ``dir`` from ``role`` (+1 user / −1 other)
==================  =========================================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- canonical column names -------------------------------------------------
CONV = "conv_id"
TURN = "turn_idx"
ROLE = "role"
TEXT = "text"
TOOL = "tool"
TS = "ts"
FOLDER = "folder_name"
SOURCE = "source"

# Derived
DIR = "dir"          # +1 outgoing (user), -1 incoming (other roles)
N_CHARS = "n_chars"  # length(text) — the pkt_len analog
TS_SEC = "ts_sec"    # float seconds since folder start — the ts_relative analog

ROLES = ("user", "assistant", "tool", "system")
SOURCES = ("background", "relayed", "proxy")

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField(FOLDER, T.StringType(), False),
        T.StructField(SOURCE, T.StringType(), False),
        T.StructField(CONV, T.StringType(), False),
        T.StructField(TURN, T.IntegerType(), False),
        T.StructField(ROLE, T.StringType(), False),
        T.StructField(TEXT, T.StringType(), True),
        T.StructField(TOOL, T.StringType(), True),
        T.StructField(TS, T.TimestampType(), False),
    ]
)


def dir_from_role(role_col: str = ROLE) -> F.Column:
    """Fixed-initiator direction rule.

    Reference: ``hayes_usenix2019_features.py:44-49`` (+1 iff src_ip is
    one of two fixed client IPs). Transcript analog: the ``user`` turn
    is outbound.
    """
    return F.when(F.col(role_col) == "user", F.lit(1)).otherwise(F.lit(-1))


def dir_from_first_role(order_cols=(TURN, TS)) -> F.Column:
    """First-sender-initiator direction rule.

    Reference: ``slt_extractor.py:252-255`` / ``dl_experiments.py:439-446``
    (+1 iff the row's sender equals the first row's sender). Requires
    the canonical per-conversation window.
    """
    w = Window.partitionBy(CONV).orderBy(*[F.col(c) for c in order_cols])
    first_role = F.first(ROLE).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.when(F.col(ROLE) == first_role, F.lit(1)).otherwise(F.lit(-1))


def with_basic_derived(df: DataFrame) -> DataFrame:
    """``n_chars`` + ``dir`` only — the stream-safe subset of
    ``with_derived`` (``ts_sec`` needs a per-scope min, which an
    unbounded stream cannot provide). Shared by the batch path and
    ``streaming.stream_features`` so the direction rule can never
    drift between them."""
    return df.withColumn(N_CHARS, F.coalesce(F.length(TEXT), F.lit(0))).withColumn(
        DIR, dir_from_role()
    )


def with_derived(df: DataFrame, ts_scope: str = FOLDER) -> DataFrame:
    """Attach the derived numeric columns every feature kernel consumes.

    - ``n_chars = length(text)`` (null text → 0),
    - ``dir`` per the fixed-initiator rule,
    - ``ts_sec`` = seconds since the *scope*'s first turn (scope =
      ``folder_name`` by default, matching the reference's per-capture
      ``ts_relative``; pass ``ts_scope=None`` for a global origin).

    The scope minimum is computed with a tiny ``groupBy`` + broadcast
    join (scope cardinality ≪ row count at any scale) — never a window
    over the full table, which would shuffle 100 TB for a per-folder
    scalar.
    """
    out = with_basic_derived(df)
    # subtract in integer microseconds BEFORE going to double: a direct
    # double cast at epoch magnitude only resolves ~2.4e-7 s and the
    # subtraction amplifies that into feature-level error
    ts_us = F.unix_micros(F.col(TS))
    if ts_scope is None:
        origin = df.agg(F.min(ts_us).alias("_t0"))
        out = out.crossJoin(F.broadcast(origin))
    else:
        origin = df.groupBy(ts_scope).agg(F.min(ts_us).alias("_t0"))
        out = out.join(F.broadcast(origin), on=ts_scope, how="inner")
    return out.withColumn(
        TS_SEC, (ts_us - F.col("_t0")).cast("double") / F.lit(1e6)
    ).drop("_t0")
