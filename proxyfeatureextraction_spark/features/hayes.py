"""Hayes-150 feature table, Spark-first.

Plan: derive → one-shuffle gate+slice (``row_number ≤ K`` bounds every
group to K rows — skew-proof by construction) → column-pruned Arrow
batches → vectorized kernel over whole conversations. ``text`` never
reaches the kernel; only ``length(text)`` is read (scale note,
SURVEY.md §7.3).

Reference: ``ta_extractor.py:39-50`` + ``hayes_usenix2019_features.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.features.hayes_vec import hayes_matrix_batch
from proxyfeatureextraction_spark.features.kernels import hayes_batch
from proxyfeatureextraction_spark.features.names import HAYES_NAMES
from proxyfeatureextraction_spark.operators.grouped import map_whole_groups
from proxyfeatureextraction_spark.operators.ordering import gated_first_k

OUT_SCHEMA = T.StructType(
    [T.StructField(S.CONV, T.StringType())]
    + [T.StructField(n, T.DoubleType()) for n in HAYES_NAMES]
)


def hayes_features(
    derived: DataFrame, pkt_limit: int = 20, vectorized: bool = True
) -> DataFrame:
    """One row per conversation with ≥ pkt_limit turns; 150 columns
    named per the reference (misaligned names kept, Q1).

    ``vectorized`` uses the (C, K)-matrix kernel (one numpy expression
    per feature block across all conversations in a batch, ~20× the
    per-conv loop); both paths are oracle-pinned.
    """
    sliced = gated_first_k(derived, pkt_limit).select(
        S.CONV, S.TURN, S.TS, S.TS_SEC, S.DIR, S.N_CHARS
    )

    if vectorized:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return hayes_matrix_batch(pdf, k=pkt_limit, columns=HAYES_NAMES)
    else:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return hayes_batch(pdf, columns=HAYES_NAMES)

    return map_whole_groups(sliced, kernel, OUT_SCHEMA)
