"""RTT-ratio feature — pure Spark (no Python kernel).

Reference: ``thesis_extractor.py:13-125``. A "perfect round trip" at
row i means rows i+1 and i+2 both flow OPPOSITE to row i (the p1
self-check at line 62 is tautological). The reference's
``head(pkt_limit)`` at line 40 is dead code — the scan covers the FULL
conversation and pkt_limit only gates which conversations qualify;
replicated here.

Expressed with lead() + row_number over flagged rows + a conditional
aggregate. lead() reads the future: this output is a whole-conversation
scalar, flagged NON-point-in-time (excluded from any as-of surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators.ordering import ORDER_COLS, with_group_count


def rtt_features(derived: DataFrame, pkt_limit: int = 20) -> DataFrame:
    w = Window.partitionBy(S.CONV).orderBy(*ORDER_COLS)
    d = with_group_count(derived, "_n").filter(F.col("_n") >= pkt_limit)
    d = (
        d.withColumn("_d1", F.lead(S.DIR, 1).over(w))
        .withColumn("_d2", F.lead(S.DIR, 2).over(w))
        .withColumn("_t1", F.lead(S.TS_SEC, 1).over(w))
        .withColumn("_t2", F.lead(S.TS_SEC, 2).over(w))
        .withColumn(
            "_trip",
            (F.col("_d1") == -F.col(S.DIR)) & (F.col("_d2") == -F.col(S.DIR)),
        )
    )
    flagged = d.filter(F.col("_trip")).withColumn(
        "_k", F.row_number().over(w)
    )
    agg = flagged.groupBy(S.CONV).agg(
        F.count(F.lit(1)).alias("_ntrip"),
        F.max(F.when(F.col("_k") == 1, F.col("_t1") - F.col(S.TS_SEC))).alias("_delta1"),
        F.max(F.when(F.col("_k") == 2, F.col("_t2") - F.col(S.TS_SEC))).alias("_delta2"),
    )
    return (
        agg.filter((F.col("_ntrip") >= 2) & (F.col("_delta2") != 0))
        .withColumn("rtt_ratio", F.col("_delta1") / F.col("_delta2"))
        .select(S.CONV, "rtt_ratio")
    )
