"""Pandas oracle for the RTT-ratio feature.

Independent re-implementation of
``/root/reference/src/feature_extraction/extractors/thesis_extractor.py``
(``_analyze_rtt_ratio``, lines 13-122) with its quirks:

- the ``head(pkt_limit)`` at line 40 is DEAD CODE — the triplet scan
  iterates ``packets`` built from the FULL group at line 33; the limit
  only gates which conns are analyzed (≥ pkt_limit rows). Replicated.
- triplet condition: the p1 self-check (line 62) is tautological
  (original src/dst are re-derived from p1 at 58-59); effective rule is
  rows i+1 and i+2 both flow opposite to row i. Overlapping windows
  allowed.
- ratio = (ts[i1+1] − ts[i1]) / (ts[i2+2] − ts[i2]) over the first two
  triplets; conn skipped if <2 triplets or the denominator is 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rtt_by_conn(packets: pd.DataFrame, pkt_limit: int = 20) -> pd.DataFrame:
    rows = []
    for conn, g in packets.groupby("conn"):  # key-sorted iteration
        if len(g) < pkt_limit:
            continue
        src = g["src_ip"].to_numpy()
        dst = g["dst_ip"].to_numpy()
        ts = g["ts_relative"].to_numpy(dtype=float)
        n = len(g)
        # reversal flag per anchor row i (vectorized over the full group)
        ok = (
            (src[1:-1] == dst[:-2]) & (dst[1:-1] == src[:-2])
            & (src[2:] == dst[:-2]) & (dst[2:] == src[:-2])
        )
        idx = np.flatnonzero(ok)
        del n
        if idx.size < 2:
            continue
        i1, i2 = int(idx[0]), int(idx[1])
        delta1 = ts[i1 + 1] - ts[i1]
        delta2 = ts[i2 + 2] - ts[i2]
        if delta2 == 0:
            continue
        rows.append({"conn": conn, "rtt_ratio": delta1 / delta2})
    return pd.DataFrame(rows)
