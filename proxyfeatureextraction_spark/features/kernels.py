"""Vectorized numpy kernels for the per-conversation feature vectors.

These run inside Arrow-batched ``mapInPandas``
(``operators.grouped.map_whole_groups``) over whole, canonically-sorted
conversations — never per-row Python at the Spark layer. Semantics are
the reference's, quirks included (SURVEY.md §7.3); the independent
pandas oracles in ``tests/oracle`` (differentially validated against
the reference itself) pin them.

Inputs per conversation: ``ts`` (float seconds, folder-relative),
``dr`` (±1 direction from role), ``sz`` (n_chars), already sliced to
the first-K canonical rows where the feature family requires it.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd

HAYES_SIZE = 150
SLT_CHECKPOINTS = (2, 4, 8, 16, 20)


def _std0(a: np.ndarray) -> float:
    """Population std; numpy's nan-on-empty behavior preserved."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return float(np.std(a))


def _q(a: np.ndarray, p: float) -> float:
    return float(np.percentile(a, p))


# --------------------------------------------------------------------------
# Hayes-150 (hayes_usenix2019_features.py:445-505; quirks Q1-Q4)
# --------------------------------------------------------------------------

def _inter_block(di: np.ndarray, do: np.ndarray, da: np.ndarray) -> list[float]:
    if di.size and do.size:
        return [di.max(), do.max(), da.max(), di.mean(), do.mean(), da.mean(),
                _std0(di), _std0(do), _std0(da), _q(di, 75), _q(do, 75), _q(da, 75)]
    if do.size:
        return [0, do.max(), da.max(), 0, do.mean(), da.mean(),
                0, _std0(do), _std0(da), 0, _q(do, 75), _q(da, 75)]
    if di.size:
        return [di.max(), 0, da.max(), di.mean(), 0, da.mean(),
                _std0(di), 0, _std0(da), _q(di, 75), 0, _q(da, 75)]
    return [0.0] * 12


def _collapsed_per_sec(ts: np.ndarray) -> np.ndarray:
    """Empty-second-collapsing rate series (Q4). For canonically sorted
    ts this is: one bucket per run of rows sharing the same *advanced*
    second pointer — computed with a scan."""
    bound = 1.0
    counts: list[int] = []
    c = 0
    for t in ts:
        if t <= bound:
            c += 1
        else:
            counts.append(c)
            bound += 1.0
            c = 1
    counts.append(c)
    return np.asarray(counts, dtype=float)


def _float_chunks(seq: np.ndarray, num: int = 20) -> list[np.ndarray]:
    stride = len(seq) / float(num)
    out, pos = [], 0.0
    while pos < len(seq):
        out.append(seq[int(pos) : int(pos + stride)])
        pos += stride
    return out


def _pad20(vals: list[float]) -> list[float]:
    vals = vals[:20]
    return vals + [0.0] * (20 - len(vals))


def hayes_vector(ts: np.ndarray, dr: np.ndarray, sz: np.ndarray) -> np.ndarray:
    del sz  # size features are defined upstream but unused by TOTAL_FEATURES
    n = ts.size
    mi, mo = dr == -1, dr == 1
    ti, to = ts[mi], ts[mo]

    d_in = np.diff(ti) if ti.size >= 2 else np.empty(0)
    d_out = np.diff(to) if to.size >= 2 else np.empty(0)
    d_all = np.diff(ts) if n >= 2 else np.empty(0)
    inter = _inter_block(d_in, d_out, d_all)

    t0 = ts.min() if n else 0.0
    timestats: list[float] = []
    for arr in (ti, to, ts):
        if arr.size:
            rel = arr - t0
            timestats += [_q(rel, 25), _q(rel, 50), _q(rel, 75), _q(rel, 100)]
        else:
            timestats += [0.0] * 4
    npk = [float(ti.size), float(to.size), float(n)]

    f30, l30 = dr[:30], dr[-30:]
    thirty = [float((f30 == -1).sum()), float((f30 == 1).sum()),
              float((l30 == -1).sum()), float((l30 == 1).sum())]

    conc = np.add.reduceat(mo.astype(float), np.arange(0, n, 20))
    per_sec = _collapsed_per_sec(ts)

    pos = np.arange(n, dtype=float)
    pi, po = pos[mi], pos[mo]

    altconc = _pad20([float(x.sum()) for x in _float_chunks(conc)])
    altsec = _pad20([float(x.sum()) for x in _float_chunks(per_sec)])

    vec = [
        *inter, *npk, *thirty,
        _std0(conc), float(conc.mean()),
        float(per_sec.mean()), _std0(per_sec),
        float(pi.mean()) if pi.size else 0.0,
        float(po.mean()) if po.size else 0.0,
        _std0(pi), _std0(po),
        _q(conc, 50), _q(per_sec, 50),
        float(per_sec.min()), float(per_sec.max()), float(conc.max()),
        ti.size / float(n), to.size / float(n),
        float(sum(altconc)), float(sum(altsec)), float(sum(npk)),
        float(sum(inter)), float(sum(timestats)),
        *altconc, *altsec, *conc.tolist(),
    ]
    out = np.zeros(HAYES_SIZE)
    out[: min(len(vec), HAYES_SIZE)] = vec[:HAYES_SIZE]
    return out


# --------------------------------------------------------------------------
# SLT checkpoint vector (slt_extractor.py:247-279; Q8 + zip-shift)
# --------------------------------------------------------------------------

def _slt_stat4(a: np.ndarray) -> list[float]:
    return [float(a.mean()), float(a.max()), float(a.min()), _std0(a)]


def slt_vector(ts: np.ndarray, dr: np.ndarray, sz: np.ndarray, max_side: int = 20) -> np.ndarray:
    """156 values per conv: 6 ratios (incl. pad), 60 timing, 15
    throughput, 15 rate, 60 size — the final size-std value the
    reference drops via zip-truncation is dropped here too."""
    first_dir = dr[0]
    up_mask = dr == first_dir
    sides = []
    for m in (up_mask, ~up_mask, None):
        t = (ts[m] if m is not None else ts)[:max_side]
        b = (sz[m] if m is not None else sz)[:max_side].astype(float)
        sides.append((t, b, np.cumsum(b)))

    vec: list[float] = []
    for k in SLT_CHECKPOINTS:
        u = float(sides[0][1][:k].sum())
        d = float(sides[1][1][:k].sum())
        vec.append(u / (u + d) if (u + d) > 0 else 0.0)
    vec.append(0.0)  # REQUIRED_LENGTH pad (slt:198-202)

    for t, _, _ in sides:
        for k in SLT_CHECKPOINTS:
            vec += _slt_stat4(np.diff(t[:k])) if t.size >= k else [0.0] * 4
    for t, _, cs in sides:
        for k in SLT_CHECKPOINTS:
            if k > t.size:
                vec.append(0.0)
            else:
                dt = t[k - 1] - t[0]
                vec.append(float(cs[k - 1] / dt) if dt > 0 else 0.0)
    for t, _, _ in sides:
        for k in SLT_CHECKPOINTS:
            if k > t.size:
                vec.append(0.0)
            else:
                dt = t[k - 1] - t[0]
                vec.append(float(k / dt) if dt > 0 else 0.0)
    for _, b, _ in sides:
        for k in SLT_CHECKPOINTS:
            vec += _slt_stat4(b[:k]) if b.size >= k else [0.0] * 4
    # zip-shift truncation (slt:294): 156 values survive against 155
    # post-key names — the final size-std value is dropped.
    return np.asarray(vec[:155], dtype=float)


# --------------------------------------------------------------------------
# batch drivers: many whole conversations per call
# --------------------------------------------------------------------------

def _group_bounds(conv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start offsets + keys of contiguous groups in a sorted batch."""
    change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate(([0], change))
    return starts, conv[starts]


def vector_batch(
    pdf: pd.DataFrame,
    fn,
    n_out: int,
    out_prefix: str = "f",
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Apply a per-conv vector kernel across a sorted batch."""
    if pdf.empty:  # _group_bounds would index into an empty array
        cols = columns or [f"{out_prefix}{i}" for i in range(n_out)]
        return pd.DataFrame(columns=["conv_id", *cols])
    conv = pdf["conv_id"].to_numpy()
    ts = pdf["ts_sec"].to_numpy(dtype=float)
    dr = pdf["dir"].to_numpy(dtype=np.int64)
    sz = pdf["n_chars"].to_numpy(dtype=np.int64)
    starts, keys = _group_bounds(conv)
    ends = np.concatenate((starts[1:], [len(conv)]))
    mat = np.empty((len(keys), n_out))
    for i, (s, e) in enumerate(zip(starts, ends)):
        mat[i] = fn(ts[s:e], dr[s:e], sz[s:e])
    cols = columns or [f"{out_prefix}{i}" for i in range(n_out)]
    out = pd.DataFrame(mat, columns=cols)
    out.insert(0, "conv_id", keys)
    return out


def hayes_batch(pdf: pd.DataFrame, columns: list[str] | None = None) -> pd.DataFrame:
    return vector_batch(pdf, hayes_vector, HAYES_SIZE, columns=columns)


def slt_batch(pdf: pd.DataFrame, columns: list[str] | None = None) -> pd.DataFrame:
    return vector_batch(pdf, slt_vector, 155, columns=columns)

# Documented divergence: the reference raises IndexError when a
# conversation's last ts < 1 s (empty second list, hayes:191-193);
# _collapsed_per_sec treats that case as a single bucket instead.
