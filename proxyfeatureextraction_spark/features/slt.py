"""SLT checkpoint feature table, Spark-first.

Plan mirrors hayes.py: first-K slice (no minimum gate — the reference
emits vectors for short conversations too, zero-filling unreachable
checkpoints, ``slt_extractor.py:281-296``) → Arrow-batched kernel.
Names keep the reference's zip-shift (see features/names.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.features.kernels import slt_batch
from proxyfeatureextraction_spark.features.names import SLT_NAMES
from proxyfeatureextraction_spark.operators.grouped import map_whole_groups
from proxyfeatureextraction_spark.operators.ordering import first_k

OUT_SCHEMA = T.StructType(
    [T.StructField(S.CONV, T.StringType())]
    + [T.StructField(n, T.DoubleType()) for n in SLT_NAMES]
)


def slt_features(
    derived: DataFrame, pkt_limit: int = 20, vectorized: bool = True
) -> DataFrame:
    sliced = first_k(derived, pkt_limit).select(
        S.CONV, S.TURN, S.TS, S.TS_SEC, S.DIR, S.N_CHARS
    )

    if vectorized:
        from proxyfeatureextraction_spark.features.slt_vec import slt_matrix_batch

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return slt_matrix_batch(pdf, k=pkt_limit, columns=SLT_NAMES)
    else:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return slt_batch(pdf, columns=SLT_NAMES)

    return map_whole_groups(sliced, kernel, OUT_SCHEMA)
