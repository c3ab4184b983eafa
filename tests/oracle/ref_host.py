"""Pandas oracle for the host volume/timing features.

Independent re-implementation of
``/root/reference/src/feature_extraction/extractors/host_feature_helpers.py``
(``extract_features_by_conn``, lines 16-136) with its quirks:

- gate: ≥ ``max_pkts`` (20) rows per conn; stats computed over the
  first min(50, n) rows in RAW order, then sorted by ts (line 70-73),
- ``duration`` spans the FULL group's raw first/last rows (line 80-82),
- pandas *sample* std / skew / kurtosis and ``mode()[0]``
  (smallest-of-ties) — Q7; empty side → 0, but 1-row side → NaN std
  (pandas ddof=1) is preserved,
- Q5: ``gap_between_conns`` diffs are computed on time-sorted start
  times but assigned positionally to key-sorted conns; last conn
  (key order) forced 0,
- direction: sent/recv via client-IP membership, flipped by ``gw``.
"""

from __future__ import annotations

import pandas as pd

from tests.oracle.packet_view import CLIENT_IPS


def host_by_conn(
    packets: pd.DataFrame,
    gw: bool = True,
    max_pkts: int = 20,
    comp_pkts_limit: int = 50,
) -> pd.DataFrame:
    df = packets.dropna(subset=["ts_relative", "pkt_len", "conn"])
    feats: list[dict] = []
    starts: list[float] = []
    for conn, g_full in df.groupby("conn"):  # key-sorted order matters for Q5
        if len(g_full) < max_pkts:
            continue
        g = g_full.head(min(comp_pkts_limit, len(g_full)))
        g = g.sort_values(by="ts_relative")

        row: dict = {"conn": conn}
        ts = g["ts_relative"].tolist()
        span = ts[-1] - ts[0]
        row["pkts_rate"] = len(g) / span if span > 0 else 0
        row["duration"] = g_full["ts_relative"].iloc[-1] - g_full["ts_relative"].iloc[0]
        starts.append(g_full["ts_relative"].iloc[0])

        vol = g["pkt_len"]
        row |= {
            "mean_vol_total_pkts": vol.mean(),
            "median_vol_total_pkts": vol.median(),
            "mode_vol_total_pkts": vol.mode()[0],
            "std_vol_total_pkts": vol.std(),
            "skew_vol_total_pkts": vol.skew(),
            "kurtosis_vol_total_pkts": vol.kurtosis(),
        }

        to_client = g["dst_ip"].isin(CLIENT_IPS)
        from_client = g["src_ip"].isin(CLIENT_IPS)
        sent = g[to_client] if gw else g[from_client]
        recv = g[from_client] if gw else g[to_client]
        for part, label in ((sent, "bytes_sent"), (recv, "bytes_recv")):
            s = part["pkt_len"]
            if s.empty:
                row |= {f"{k}_{label}": 0 for k in ("mean", "median", "mode", "std", "skew", "kurtosis")}
            else:
                row |= {
                    f"mean_{label}": s.mean(),
                    f"median_{label}": s.median(),
                    f"mode_{label}": s.mode()[0],
                    f"std_{label}": s.std(),
                    f"skew_{label}": s.skew(),
                    f"kurtosis_{label}": s.kurtosis(),
                }
        feats.append(row)

    # Q5: time-order diffs, key-order assignment
    ordered = sorted(starts)
    diffs = [abs(ordered[i + 1] - ordered[i]) for i in range(len(ordered) - 1)]
    for i, row in enumerate(feats[:-1]):
        row["gap_between_conns"] = diffs[i]
    if feats:
        feats[-1]["gap_between_conns"] = 0
    return pd.DataFrame(feats)
