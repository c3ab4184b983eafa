"""Sources (S1/S2/S3/S5/S6), dataset assembly (§3.2) and flow-pair
tensors (W10/§3.3)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.features.flowpair import flow_pairs
from proxyfeatureextraction_spark.plans.dataset import build_dataset, to_matrix
from proxyfeatureextraction_spark.schema import with_derived
from proxyfeatureextraction_spark.sources import transcripts as SRC


def test_sources_roundtrip(spark, transcripts_df, tmp_path):
    p = str(tmp_path / "t")
    transcripts_df.write.mode("overwrite").parquet(p)
    df = SRC.read_transcripts(spark, p)
    assert df.count() == transcripts_df.count()

    manifest = spark.createDataFrame(
        [("folder_0", "train"), ("folder_1", "test")], "folder_name string, split string"
    )
    tr = SRC.filter_split(df, manifest, "train")
    assert set(r[0] for r in tr.select(S.FOLDER).distinct().collect()) == {"folder_0"}

    assert SRC.by_source(df, "proxy").count() == transcripts_df.filter(
        F.col(S.SOURCE) == "proxy"
    ).count()

    feats = df.groupBy(S.FOLDER, S.CONV, S.SOURCE).agg(F.count(F.lit(1)).alias("n"))
    out = str(tmp_path / "f")
    SRC.write_features(feats, out)
    back = SRC.read_feature_table(spark, out, source="proxy")
    assert back.count() == feats.filter(F.col(S.SOURCE) == "proxy").count()


def test_dataset_assembly(spark, transcripts_df):
    d = with_derived(transcripts_df)
    f1 = d.groupBy(S.FOLDER, S.CONV, S.SOURCE).agg(F.count(F.lit(1)).alias("n_turns"))
    f2 = d.groupBy(S.FOLDER, S.CONV).agg(F.sum(S.N_CHARS).alias("total_chars"))
    manifest = spark.createDataFrame(
        [(f"folder_{i}", "train" if i % 2 == 0 else "test") for i in range(4)],
        "folder_name string, split string",
    )
    ds = build_dataset([f1, f2], manifest, "train")
    pdf = ds.toPandas()
    assert set(pdf[S.FOLDER].unique()) <= {"folder_0", "folder_2"}
    assert set(pdf["label"].unique()) <= {0, 1, 2}
    m = to_matrix(ds).toPandas()
    assert set(m.columns) == {"n_turns", "total_chars", "label"}


def test_flow_pairs(spark, transcripts_df, transcripts_pdf):
    d = with_derived(transcripts_df)
    gw = d.select(S.TS_SEC, S.N_CHARS)
    out = flow_pairs(d, gw, k=50).toPandas()
    counts = transcripts_pdf.groupby(S.CONV).size()
    assert set(out[S.CONV]) == set(counts[counts >= 50].index)
    for _, row in out.iterrows():
        flow = np.array([list(x) for x in row["flow"]])
        assert flow.shape == (50, 3)
        n = int(row["n_flow"])
        assert n == 50
        assert set(np.unique(flow[:, 2])) <= {-1.0, 0.0, 1.0}
        gwf = np.array([list(x) for x in row["gw_flow"]])
        assert gwf.shape == (50, 3)
        if row["n_gw"] >= 50:
            assert (gwf[:, 0] > 0).all()
        # gateway rows inside the conv span
        lo, hi = flow[:, 1].min(), flow[:, 1].max()
        nz = gwf[gwf[:, 0] > 0]
        if len(nz):
            assert (nz[:, 1] >= lo - 1e-9).all() and (nz[:, 1] <= hi + 1e-9).all()
