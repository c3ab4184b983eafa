"""Property-based check: asof_join ≡ pd.merge_asof on random inputs
(hypothesis; few examples — each drives a full Spark job)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from proxyfeatureextraction_spark.operators.asof import asof_join


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_left=st.integers(1, 80),
    n_right=st.integers(0, 60),
    span=st.floats(1.0, 1e4),
)
def test_asof_matches_merge_asof(spark, seed, n_left, n_right, span):
    rng = np.random.default_rng(seed)
    keys = ["a", "b", "c"]
    left = pd.DataFrame(
        {
            "k": rng.choice(keys, n_left),
            "t": np.round(rng.uniform(0, span, n_left), 6),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.choice(keys, max(n_right, 1))[:n_right],
            "t": np.round(rng.uniform(0, span, max(n_right, 1))[:n_right], 6),
            "v": rng.normal(size=n_right),
        }
    ).sort_values("t").reset_index(drop=True)

    if n_right == 0:
        right = pd.DataFrame({"k": pd.Series(dtype=object), "t": pd.Series(dtype=float),
                              "v": pd.Series(dtype=float)})

    ldf = spark.createDataFrame(left, schema="k string, t double")
    rdf = spark.createDataFrame(right, schema="k string, t double, v double")
    got = (
        asof_join(ldf, rdf, ts_col="t", by=["k"], value_cols=["v"])
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(left, right, on="t", by="k", direction="backward").sort_values(
        ["k", "t"]
    ).reset_index(drop=True)
    np.testing.assert_allclose(
        got["v_asof"].to_numpy(float), exp["v"].to_numpy(float), atol=1e-12, equal_nan=True
    )
