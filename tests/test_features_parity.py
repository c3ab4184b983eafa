"""Spark feature kernels vs the reference-validated pandas oracles.

allclose atol=1e-5 per the reference's own tolerance
(test_corr_extractor.py:158); NaNs compare equal (they are part of the
reference semantics — e.g. std_order_in of a single-role conversation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.features.corr import corr_features
from proxyfeatureextraction_spark.features.hayes import hayes_features
from proxyfeatureextraction_spark.features.host import host_features
from proxyfeatureextraction_spark.features.rtt import rtt_features
from proxyfeatureextraction_spark.features.slt import slt_features
from proxyfeatureextraction_spark.schema import with_derived
from tests.oracle.packet_view import to_packet_view
from tests.oracle.ref_corr import corr_by_conn
from tests.oracle.ref_hayes import hayes_by_conn
from tests.oracle.ref_host import host_by_conn
from tests.oracle.ref_rtt import rtt_by_conn
from tests.oracle.ref_slt import slt_by_conn

ATOL = 1e-5


@pytest.fixture(scope="module")
def derived(spark, transcripts_df):
    d = with_derived(transcripts_df).cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def packets(transcripts_pdf):
    return to_packet_view(transcripts_pdf)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key=S.CONV):
    oracle_pdf = oracle_pdf.rename(columns={"conn": key})
    assert set(spark_pdf[key]) == set(oracle_pdf[key])
    cols = [c for c in oracle_pdf.columns if c != key]
    missing = set(cols) - set(spark_pdf.columns)
    assert not missing, f"spark output missing {missing}"
    a = spark_pdf.set_index(key).sort_index()
    b = oracle_pdf.set_index(key).sort_index()
    for c in cols:
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float),
            b[c].to_numpy(dtype=float),
            atol=ATOL,
            equal_nan=True,
            err_msg=c,
        )


def test_hayes_parity(derived, packets):
    compare(hayes_features(derived, 20).toPandas(), hayes_by_conn(packets, 20))


def test_slt_parity(derived, packets):
    compare(slt_features(derived, 20).toPandas(), slt_by_conn(packets, 20))


def test_rtt_parity(derived, packets):
    compare(rtt_features(derived, 20).toPandas(), rtt_by_conn(packets, 20))


def test_corr_parity(derived, packets):
    gateway = derived.select(S.TS_SEC, S.N_CHARS)
    spark_out = corr_features(derived, gateway, pkt_limit=20).toPandas()
    oracle = corr_by_conn(
        packets, packets[["ts_relative", "pkt_len"]].copy(), pkt_limit=20
    )
    compare(spark_out, oracle)


def test_host_parity(derived, packets):
    spark_out = host_features(derived, gw=False).toPandas()
    # reference scope = one folder per call; concat per-folder oracles
    oracle = pd.concat(
        [host_by_conn(g, gw=False) for _, g in packets.groupby("folder_name")],
        ignore_index=True,
    )
    compare(spark_out.drop(columns=[S.FOLDER]), oracle)


def test_host_parity_gw_true(derived, packets):
    spark_out = host_features(derived, gw=True).toPandas()
    oracle = pd.concat(
        [host_by_conn(g, gw=True) for _, g in packets.groupby("folder_name")],
        ignore_index=True,
    )
    compare(spark_out.drop(columns=[S.FOLDER]), oracle)


def test_empty_input(spark, derived):
    empty = derived.limit(0)
    assert hayes_features(empty).count() == 0
    assert slt_features(empty).count() == 0
    assert rtt_features(empty).count() == 0
    assert host_features(empty).count() == 0
    gw = derived.select(S.TS_SEC, S.N_CHARS)
    assert corr_features(empty, gw).count() == 0


def test_hayes_matrix_kernel_row_order_semantics_nonmonotone_ts():
    """Review regression: the (C, K)-matrix kernel must equal the loop
    kernel on conversations whose canonical (turn_idx) order is NOT
    time-monotone — the loop kernel diffs direction times in ROW order
    and anchors percentiles at ts.min(); a value-sorting matrix kernel
    silently disagreed on such rows."""
    from proxyfeatureextraction_spark.features.hayes_vec import hayes_matrix_batch
    from proxyfeatureextraction_spark.features.kernels import hayes_vector
    from proxyfeatureextraction_spark.features.names import HAYES_NAMES

    rng = np.random.default_rng(7)
    k = 20
    rows = []
    for conv in ("x", "y", "z"):
        ts = np.round(rng.uniform(0, 30, size=k), 3)  # deliberately unsorted
        if conv == "y":
            ts = np.sort(ts)  # one monotone control conversation
        dr = rng.choice([-1, 1], size=k)
        for i in range(k):
            rows.append((conv, float(ts[i]), int(dr[i])))
    pdf = pd.DataFrame(rows, columns=["conv_id", "ts_sec", "dir"])
    got = hayes_matrix_batch(pdf, k=k, columns=HAYES_NAMES).set_index("conv_id")
    for conv, grp in pdf.groupby("conv_id", sort=False):
        exp = hayes_vector(
            grp["ts_sec"].to_numpy(), grp["dir"].to_numpy(), None
        )
        np.testing.assert_allclose(
            got.loc[conv, HAYES_NAMES].to_numpy(dtype=float), exp,
            atol=ATOL, equal_nan=True,
            err_msg=f"matrix kernel diverges from loop kernel for {conv}",
        )
