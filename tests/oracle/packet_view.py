"""Map transcripts → the reference-native packet shape (FIXTURES.md §4).

``conv_id → conn``, ``ts_sec → ts_relative``, ``length(text) → pkt_len``,
and ``role`` → synthesized ``src_ip``/``dst_ip`` pairs so the oracles can
execute the reference's IP-based direction rules verbatim
(``hayes_usenix2019_features.py:44-49``: client IPs are 10.0.2.15/16).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CLIENT_IP = "10.0.2.15"
SERVER_IP = "93.184.216.34"
CLIENT_IPS = {"10.0.2.15", "10.0.2.16"}


def to_packet_view(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Return the packet-shaped frame in canonical (conv, turn) order.

    Column order matters downstream: the reference feeds rows
    positionally (``hayes_usenix2019_features.py:40-51`` expects
    index 2 = ts, index 3 = src_ip, index 7 = pkt_len).
    """
    t = transcripts.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )
    ts0 = t.groupby("folder_name")["ts"].transform("min")
    is_user = (t["role"] == "user").to_numpy()
    pdf = pd.DataFrame(
        {
            "conn": t["conv_id"].to_numpy(),            # 0
            "folder_name": t["folder_name"].to_numpy(), # 1
            "ts_relative": (t["ts"] - ts0).dt.total_seconds().to_numpy(),  # 2
            "src_ip": np.where(is_user, CLIENT_IP, SERVER_IP),  # 3
            "dst_ip": np.where(is_user, SERVER_IP, CLIENT_IP),  # 4
            "proto": "tcp",                             # 5
            "port": 443,                                # 6
            "pkt_len": t["text"].str.len().fillna(0).astype(np.int64).to_numpy(),  # 7
        }
    )
    return pdf
