"""Pandas/numpy oracle for the SLT checkpoint feature vector.

Independent re-implementation of
``/root/reference/src/feature_extraction/extractors/slt_extractor.py``
observable semantics (``extract_features``, lines 247-279):

- checkpoints K ∈ {2, 4, 8, 16, 20} (line 37),
- "upload" = rows whose sender equals the FIRST row's sender (line
  252-255), each side then ``head(20)``,
- per-checkpoint stats use numpy population std,
- names say ``_ms`` but values are plain seconds (Q8) — names kept,
- upstream-ratio list is padded to length 6 (REQUIRED_LENGTH, line 38),
- per-conn gate: groups come in key-sorted order, sliced to
  ``head(pkt_limit)`` first (line 286-288); empty group → skipped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CHECKPOINTS = [2, 4, 8, 16, 20]
RATIO_LEN = 6
MAX_PACKETS = 20


def _stat4(arr: np.ndarray) -> list[float]:
    return [float(np.mean(arr)), float(np.max(arr)), float(np.min(arr)), float(np.std(arr))]


def _timing(ts: np.ndarray) -> list[float]:
    out: list[float] = []
    for k in CHECKPOINTS:
        if len(ts) >= k:
            out += _stat4(np.diff(ts[:k]))
        else:
            out += [0.0] * 4
    return out


def _throughput(ts: np.ndarray, csum: np.ndarray) -> list[float]:
    out = []
    for k in CHECKPOINTS:
        if k > len(ts):
            out.append(0.0)
        else:
            dt = ts[k - 1] - ts[0]
            out.append(float(csum[k - 1] / dt) if dt > 0 else 0.0)
    return out


def _rate(ts: np.ndarray) -> list[float]:
    out = []
    for k in CHECKPOINTS:
        if k > len(ts):
            out.append(0.0)
        else:
            dt = ts[k - 1] - ts[0]
            out.append(float(k / dt) if dt > 0 else 0.0)
    return out


def _sizes(b: np.ndarray) -> list[float]:
    out: list[float] = []
    for k in CHECKPOINTS:
        if k > len(b):
            out += [0.0] * 4
        else:
            out += _stat4(b[:k])
    return out


def slt_features(g: pd.DataFrame) -> list[float] | None:
    """156-value vector for one conn group (already head(pkt_limit))."""
    if g.empty:
        return None
    first_src = g.iloc[0]["src_ip"]
    up = g[g["src_ip"] == first_src].head(MAX_PACKETS)
    down = g[g["src_ip"] != first_src].head(MAX_PACKETS)
    both = g.head(MAX_PACKETS)

    sides = {}
    for name, part in (("up", up), ("down", down), ("both", both)):
        ts = part["ts_relative"].to_numpy(dtype=float)
        b = part["pkt_len"].to_numpy(dtype=float)
        sides[name] = (ts, b, np.cumsum(b))

    ratios = []
    for k in CHECKPOINTS:
        u = float(sides["up"][1][:k].sum())
        d = float(sides["down"][1][:k].sum())
        ratios.append(u / (u + d) if (u + d) > 0 else 0.0)
    ratios += [0.0] * (RATIO_LEN - len(ratios))

    feats = list(ratios)
    for name in ("up", "down", "both"):
        feats += _timing(sides[name][0])
    for name in ("up", "down", "both"):
        feats += _throughput(sides[name][0], sides[name][2])
    for name in ("up", "down", "both"):
        feats += _rate(sides[name][0])
    for name in ("up", "down", "both"):
        feats += _sizes(sides[name][1])
    return [float(x) for x in feats]


def slt_feature_names() -> list[str]:
    """The reference's published names (slt:44-78): 156 entries
    including ``conn``.

    Two deliberate misalignments vs the 157-long value list
    ([conn] + 6 ratios + 60 timing + 15 throughput + 15 rate + 60 size):

    - names have only 5 ratio entries (no pad name) → every later name
      is shifted one slot left and ``dict(zip(names, values))``
      (slt:294) silently drops the final size-std value;
    - throughput/rate names interleave per direction (slt:62-66) while
      values group all throughput before all rate (slt:232-237).

    Parity = keep the names AND the value order; join by position.
    """
    names = ["conn"]
    names += [f"upstream_ratio_at_{k}pkt_%" for k in CHECKPOINTS]
    for d in ("upload", "download", "bidirectional"):
        for k in CHECKPOINTS:
            names += [f"{d}_timing_{k}pkt_{s}_ms" for s in ("mean", "max", "min", "std")]
    for d in ("upload", "download", "bidirectional"):
        names += [f"{d}_throughput_{k}pkt_bytes_per_sec" for k in CHECKPOINTS]
        names += [f"{d}_packet_rate_{k}pkt_per_sec" for k in CHECKPOINTS]
    for d in ("upload", "download", "bidirectional"):
        for k in CHECKPOINTS:
            names += [f"{d}_size_{k}pkt_{s}_bytes" for s in ("mean", "max", "min", "std")]
    assert len(names) == 156
    return names


def slt_by_conn(packets: pd.DataFrame, pkt_limit: int = 20) -> pd.DataFrame:
    rows = []
    names = slt_feature_names()
    for conn, g in packets.groupby("conn"):  # key-sorted, slt:286
        vals = slt_features(g.head(pkt_limit))
        if not vals:
            continue
        row_vals = [conn, *vals]  # 157 long; zip truncates to 156 (slt:294)
        rows.append(dict(zip(names, row_vals)))
    return pd.DataFrame(rows)
