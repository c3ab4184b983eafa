"""The matrix-vectorized Hayes kernel is bit-equivalent to the
per-conv loop kernel on a large random corpus (both are oracle-pinned
elsewhere; this covers paths the small fixture may miss)."""

from __future__ import annotations

import numpy as np

from proxyfeatureextraction_spark.features.hayes_vec import hayes_matrix_batch
from proxyfeatureextraction_spark.features.kernels import hayes_batch
from proxyfeatureextraction_spark.features.names import HAYES_NAMES
from proxyfeatureextraction_spark.synth import synth_transcripts_pdf


def _slice20(seed: int):
    pdf = synth_transcripts_pdf(n_convs=500, seed=seed)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ts0 = pdf.groupby("folder_name")["ts"].transform("min")
    pdf["ts_sec"] = (pdf["ts"] - ts0).dt.total_seconds()
    pdf["dir"] = np.where(pdf["role"] == "user", 1, -1)
    pdf["n_chars"] = pdf["text"].str.len()
    sizes = pdf.groupby("conv_id")["turn_idx"].transform("size")
    sl = pdf[sizes >= 20].groupby("conv_id").head(20)
    return sl.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_matrix_kernel_equals_loop_kernel():
    for seed in (123, 7):
        sl = _slice20(seed)
        a = hayes_batch(sl, columns=HAYES_NAMES).sort_values("conv_id").reset_index(drop=True)
        b = hayes_matrix_batch(sl, 20, HAYES_NAMES).sort_values("conv_id").reset_index(drop=True)
        assert (a["conv_id"] == b["conv_id"]).all()
        for c in HAYES_NAMES:
            np.testing.assert_allclose(a[c], b[c], atol=1e-9, equal_nan=True, err_msg=c)


def test_slt_matrix_kernel_equals_loop_kernel():
    from proxyfeatureextraction_spark.features.kernels import slt_batch
    from proxyfeatureextraction_spark.features.names import SLT_NAMES
    from proxyfeatureextraction_spark.features.slt_vec import slt_matrix_batch

    pdf = synth_transcripts_pdf(n_convs=400, seed=55)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ts0 = pdf.groupby("folder_name")["ts"].transform("min")
    pdf["ts_sec"] = (pdf["ts"] - ts0).dt.total_seconds()
    pdf["dir"] = np.where(pdf["role"] == "user", 1, -1)
    pdf["n_chars"] = pdf["text"].str.len()
    sl = (
        pdf.groupby("conv_id").head(20)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    a = slt_batch(sl, columns=SLT_NAMES).sort_values("conv_id").reset_index(drop=True)
    b = slt_matrix_batch(sl, 20, SLT_NAMES).sort_values("conv_id").reset_index(drop=True)
    assert (a["conv_id"] == b["conv_id"]).all()
    for c in SLT_NAMES:
        np.testing.assert_allclose(
            a[c].astype(float), b[c].astype(float), atol=1e-9, equal_nan=True, err_msg=c
        )


def test_matrix_kernel_empty():
    import pandas as pd

    out = hayes_matrix_batch(
        pd.DataFrame({"conv_id": [], "ts_sec": [], "dir": [], "n_chars": []}),
        20,
        HAYES_NAMES,
    )
    assert out.empty
