"""Pandas/numpy oracle for the Hayes-150 feature vector.

Independent re-implementation of the observable semantics of
``/root/reference/src/feature_extraction/extractors/hayes_usenix2019_features.py``
(``TOTAL_FEATURES``, lines 445-505), including its quirks:

- Q1: value order is intertimestats(12), number_pkts(3), thirtypkts(4),
  20 scalars, altconc(20), alt_per_sec(20), conc(variable), zero-pad to
  150 — the published ``feature_names`` after index 11 do NOT match the
  values (``ta_extractor.py:21-36``); we keep both order and names.
- Q3: both-directions-empty would crash the reference (line 450 iterates
  an int); unreachable under the ≥K gate — we emit 12 zeros.
- Q4: the per-second series collapses empty seconds (stateful loop,
  lines 193-203) rather than zero-filling; a packet that skips ahead
  still lands in the *next* bucket only.
- NaN: ``std_order_in/out`` over an empty direction is numpy
  ``std([]) = nan`` — preserved.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

MAX_SIZE = 150


def _pstd(a) -> float:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return float(np.std(np.asarray(a, dtype=float)))


def _pct(a, q) -> float:
    return float(np.percentile(np.asarray(a, dtype=float), q))


def _deltas(ts: np.ndarray) -> np.ndarray:
    return np.diff(ts) if ts.size >= 2 else np.array([])


def _interarrival_block(ts_in, ts_out, ts_all) -> list[float]:
    """12 values: max/avg/std_pop/p75 for in, out, total (with the
    reference's single-direction zero-fill branches, hayes:85-103)."""
    din, dout, dall = _deltas(ts_in), _deltas(ts_out), _deltas(ts_all)
    if din.size and dout.size:
        return [
            din.max(), dout.max(), dall.max(),
            din.mean(), dout.mean(), dall.mean(),
            _pstd(din), _pstd(dout), _pstd(dall),
            _pct(din, 75), _pct(dout, 75), _pct(dall, 75),
        ]
    if dout.size:
        return [0, dout.max(), dall.max(), 0, dout.mean(), dall.mean(),
                0, _pstd(dout), _pstd(dall), 0, _pct(dout, 75), _pct(dall, 75)]
    if din.size:
        return [din.max(), 0, dall.max(), din.mean(), 0, dall.mean(),
                _pstd(din), 0, _pstd(dall), _pct(din, 75), 0, _pct(dall, 75)]
    return [0.0] * 12


def _time_percentile_block(ts_in, ts_out, ts_all) -> list[float]:
    """hayes:106-139 — p25/50/75/100 of (ts − min ts) per dir + total."""
    out: list[float] = []
    t0 = ts_all.min() if ts_all.size else 0.0
    for arr in (ts_in, ts_out, ts_all):
        if arr.size:
            rel = arr - t0
            out += [_pct(rel, 25), _pct(rel, 50), _pct(rel, 75), _pct(rel, 100)]
        else:
            out += [0.0] * 4
    return out


def _per_sec_series(ts_all: np.ndarray) -> list[int]:
    """hayes:185-205 — collapse-empty-seconds bucket counts (Q4)."""
    bound = 1
    last_second = int(math.ceil(ts_all[-1]))
    counts: list[int] = []
    c = 0
    for t in ts_all:
        if t <= bound:
            c += 1
        else:
            counts.append(c)
            bound += 1  # sec list advances exactly one slot (the quirk)
            c = 1
    counts.append(c)
    del last_second
    return counts


def _chunk_slices(seq: list, num: int = 20) -> list[list]:
    """hayes:28-35 — float-stride re-chunking (index truncation math)."""
    stride = len(seq) / float(num)
    out, pos = [], 0.0
    while pos < len(seq):
        out.append(seq[int(pos) : int(pos + stride)])
        pos += stride
    return out


def _fixed20(vals: list[float]) -> list[float]:
    vals = list(vals[:20])
    return vals + [0.0] * (20 - len(vals))


def hayes_features(pkts: list[tuple[float, int, int]], max_size: int = MAX_SIZE) -> list[float]:
    """``TOTAL_FEATURES`` equivalent over (ts, direction, size) triples.

    Input must already be the first-K slice in canonical order
    (``ta_extractor.py:48`` slices before calling).
    """
    ts_all = np.array([p[0] for p in pkts], dtype=float)
    dr = np.array([p[1] for p in pkts], dtype=int)
    ts_in, ts_out = ts_all[dr == -1], ts_all[dr == 1]
    n = len(pkts)

    intertimestats = _interarrival_block(ts_in, ts_out, ts_all)
    timestats = _time_percentile_block(ts_in, ts_out, ts_all)
    number_pkts = [int(ts_in.size), int(ts_out.size), n]

    first30, last30 = dr[:30], dr[-30:]
    thirtypkts = [
        int((first30 == -1).sum()), int((first30 == 1).sum()),
        int((last30 == -1).sum()), int((last30 == 1).sum()),
    ]

    # outgoing concentration per raw chunk of 20 (hayes:172-182)
    conc = [int((dr[i : i + 20] == 1).sum()) for i in range(0, n, 20)]
    stdconc, avgconc = _pstd(conc), float(np.mean(conc))
    medconc, maxconc = _pct(conc, 50), float(max(conc))

    per_sec = _per_sec_series(ts_all)
    avg_per_sec, std_per_sec = float(np.mean(per_sec)), _pstd(per_sec)
    med_per_sec = _pct(per_sec, 50)
    min_per_sec, max_per_sec = float(min(per_sec)), float(max(per_sec))

    # ordering stats (hayes:208-224): row positions by direction
    pos = np.arange(n)
    pos_in, pos_out = pos[dr == -1], pos[dr == 1]
    avg_order_in = float(pos_in.mean()) if pos_in.size else 0.0
    avg_order_out = float(pos_out.mean()) if pos_out.size else 0.0
    std_order_in, std_order_out = _pstd(pos_in), _pstd(pos_out)

    perc_in, perc_out = ts_in.size / float(n), ts_out.size / float(n)

    altconc = _fixed20([sum(x) for x in _chunk_slices(conc)])
    alt_per_sec = _fixed20([sum(x) for x in _chunk_slices(per_sec)])

    feats: list[float] = []
    feats += intertimestats
    feats += number_pkts
    feats += thirtypkts
    feats += [stdconc, avgconc, avg_per_sec, std_per_sec,
              avg_order_in, avg_order_out, std_order_in, std_order_out,
              medconc, med_per_sec, min_per_sec, max_per_sec, maxconc,
              perc_in, perc_out,
              sum(altconc), sum(alt_per_sec), sum(number_pkts),
              sum(intertimestats), sum(timestats)]
    feats += altconc
    feats += alt_per_sec
    feats += conc
    feats += [0.0] * (max_size - len(feats))
    return [float(x) for x in feats[:max_size]]


# Published column names (ta_extractor.py:21-36) — misaligned after
# index 11 by design (Q1): kept for schema parity.
FEATURE_NAMES: list[str] = (
    ["max_in", "max_out", "max_total", "avg_in", "avg_out", "avg_total",
     "std_in", "std_out", "std_total",
     "75th_percentile_in", "75th_percentile_out", "75th_percentile_total"]
    + [f"{q}th_percentile_{d}_time" for d in ("in", "out", "total") for q in (25, 50, 75, 100)]
    + ["nb_pkts_in", "nb_pkts_out", "nb_pkts_total",
       "nb_pkts_in_f30", "nb_pkts_out_f30", "nb_pkts_in_l30", "nb_pkts_out_l30",
       "std_pkt_conc_out20", "avg_pkt_conc_out20", "avg_per_sec", "std_per_sec",
       "avg_order_in", "avg_order_out", "std_order_in", "std_order_out",
       "medconc", "med_per_sec", "min_per_sec", "max_per_sec", "maxconc",
       "perc_in", "perc_out", "sum_altconc", "sum_alt_per_sec",
       "sum_number_pkts", "sum_intertimestats"]
    + [f"altconc_{i + 1}" for i in range(20)]
    + [f"alt_per_sec_{i + 1}" for i in range(20)]
    + [f"conc_{i + 1}" for i in range(60)]
)
assert len(FEATURE_NAMES) == MAX_SIZE


def hayes_by_conn(packets: "pd.DataFrame", pkt_limit: int = 20):
    """Per-conn Hayes table mirroring ``ta_extractor.py:39-50``:
    insertion-order groups, raw-order first-K slice, ≥K gate."""
    import pandas as pd

    from tests.oracle.packet_view import CLIENT_IPS

    rows = []
    for conn, g in packets.groupby("conn", sort=False):
        if len(g) < pkt_limit:
            continue
        head = g.iloc[:pkt_limit]
        trips = list(
            zip(
                head["ts_relative"].astype(float),
                np.where(head["src_ip"].isin(CLIENT_IPS), 1, -1),
                head["pkt_len"].astype(int),
            )
        )
        rows.append({"conn": conn, **dict(zip(FEATURE_NAMES, hayes_features(trips)))})
    return pd.DataFrame(rows)
