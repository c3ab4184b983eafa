"""Pandas/numpy oracle for the gateway-correlation features.

Independent re-implementation of the semantics of
``/root/reference/src/feature_extraction/extractors/corr_extractor.py``
(``_get_correlation_array``, lines 118-206), cross-checked against the
reference's own sequential CPU oracle
(``tests/test_feature_extraction/test_corr_extractor.py:12-89``):

- gate conns with ≥ pkt_limit rows, keep first pkt_limit rows in
  (conn, ts) order,
- 0.1 s tumbling bins via ``floor(ts·10)/10`` (exact float formula),
- gateway bins restricted to [conn_min_ts, conn_max_ts + 1.0]
  (inclusive both ends — searchsorted left/right on bin values),
- full-outer align on bin, missing → 0, z-score (pop std + 1e-9),
  elementwise product, then count/sum/mean/median/min/max/range/
  var_pop/std_pop; empty gateway slice → all-zero metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BIN_SIZE_SECONDS = 0.1

METRIC_COLS = [
    "corr_count", "corr_sum", "corr_mean", "corr_median",
    "corr_minimum", "corr_maximum", "corr_range", "corr_variance", "corr_std_dev",
]


def _metrics(arr: np.ndarray) -> tuple:
    mx, mn = float(arr.max()), float(arr.min())
    return (
        int(arr.size), float(arr.sum()), float(arr.mean()), float(np.median(arr)),
        mn, mx, mx - mn, float(np.var(arr)), float(np.std(arr)),
    )


def corr_by_conn(
    conn_df: pd.DataFrame,
    gateway_df: pd.DataFrame,
    pkt_limit: int = 20,
    bin_size: float = BIN_SIZE_SECONDS,
) -> pd.DataFrame:
    cd = conn_df.dropna(subset=["ts_relative", "pkt_len"]).copy()
    gw = gateway_df.dropna(subset=["ts_relative", "pkt_len"]).copy()
    cd["ts_relative"] = cd["ts_relative"].astype(float)
    cd["pkt_len"] = cd["pkt_len"].astype(float)
    gw["ts_relative"] = gw["ts_relative"].astype(float)
    gw["pkt_len"] = gw["pkt_len"].astype(float)

    sizes = cd.groupby("conn").size()
    cd = cd[cd["conn"].isin(sizes[sizes >= pkt_limit].index)]
    cd = cd.sort_values(["conn", "ts_relative"], kind="stable")
    cd = cd.groupby("conn").head(pkt_limit)

    factor = 1.0 / bin_size
    cd["time_bin"] = np.floor(cd["ts_relative"] * factor) / factor
    gw["time_bin"] = np.floor(gw["ts_relative"] * factor) / factor

    gw_bins = gw.groupby("time_bin")["pkt_len"].sum().reset_index().sort_values("time_bin")
    conn_bins = cd.groupby(["conn", "time_bin"])["pkt_len"].sum().reset_index()
    spans = cd.groupby("conn")["ts_relative"].agg(["min", "max"])

    out = []
    for conn, (tmin, tmax) in spans.iterrows():
        sub = gw_bins[(gw_bins["time_bin"] >= tmin) & (gw_bins["time_bin"] <= tmax + 1.0)]
        if sub.empty:
            out.append((conn, *(0,) * 9))
            continue
        mine = conn_bins[conn_bins["conn"] == conn]
        merged = sub.merge(
            mine.rename(columns={"pkt_len": "rl_len"})[["time_bin", "rl_len"]],
            on="time_bin",
            how="outer",
        ).fillna({"pkt_len": 0, "rl_len": 0})
        gv = merged["pkt_len"].to_numpy()
        rv = merged["rl_len"].to_numpy()
        gz = (gv - gv.mean()) / (gv.std() + 1e-9)
        rz = (rv - rv.mean()) / (rv.std() + 1e-9)
        out.append((conn, *_metrics(gz * rz)))
    return pd.DataFrame(out, columns=["conn", *METRIC_COLS])
