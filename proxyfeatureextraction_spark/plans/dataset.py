"""Classification data plane (SURVEY §3.2): scan + split filter +
union + label + multi-key feature join — the reference's
``classification/data.py`` pipeline as one declarative plan.

Labels follow the reference (``classification/data.py:20-21,58-63``):
background → 0, relayed → 1, proxy/gateway → 2 by ``source``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.sources.transcripts import filter_split

LABELS = {"background": 0, "relayed": 1, "proxy": 2}


def label_col(source_col: str = S.SOURCE) -> F.Column:
    expr = F.lit(None).cast("int")
    for src, lbl in LABELS.items():
        expr = F.when(F.col(source_col) == src, F.lit(lbl)).otherwise(expr)
    return expr


def build_dataset(
    feature_tables: list[DataFrame],
    manifest: DataFrame | None = None,
    split: str | None = None,
    keys: tuple[str, ...] = (S.FOLDER, S.CONV),
) -> DataFrame:
    """Join N feature tables on (folder_name, conv_id) (J6), optionally
    restrict to a manifest split (S2), attach the label, and drop the
    key columns from the numeric matrix view."""
    out = feature_tables[0]
    for other in feature_tables[1:]:
        dup = [c for c in other.columns if c in out.columns and c not in keys]
        out = out.join(other.drop(*dup), on=list(keys), how="inner")
    if manifest is not None and split is not None:
        out = filter_split(out, manifest, split)
    if S.SOURCE in out.columns:
        out = out.withColumn("label", label_col())
    return out


def to_matrix(dataset: DataFrame, keys: tuple[str, ...] = (S.FOLDER, S.CONV)) -> DataFrame:
    """Numeric-only view (the reference drops conn/folder cols before
    fitting, ``run_classification.py:33-35``)."""
    drop = [c for c in keys if c in dataset.columns]
    num = [
        f.name
        for f in dataset.schema.fields
        if f.name not in drop and f.dataType.typeName() in ("double", "float", "integer", "long")
    ]
    return dataset.select(*num)
