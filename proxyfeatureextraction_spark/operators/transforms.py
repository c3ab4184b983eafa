"""Deterministic per-conversation transforms (the reference's attack /
bias-removal stage, ``preprocessing.py:43-227``), as seeded grouped-map
kernels.

The reference draws UNSEEDED numpy RNG (Q6) — its own tests must
monkeypatch the RNG to test anything. This engine keys an RNG to
``(run_seed, conv_id)`` so transforms are reproducible, re-runnable and
cluster-layout-invariant (a conversation's draw never depends on which
executor or batch processed it).

Transform semantics on the transcript domain: ``n_chars`` plays
``pkt_len`` (text is re-synthesized to the new length), ``ts`` plays
``ts_relative``. Only conversations with ≥ ``pkt_limit`` turns are
transformed; others pass through untouched (``preprocessing.py:207-217``),
and original row order is restored by the canonical ``turn_idx`` sort
(``preprocessing.py:226`` sort_index analog).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.operators.grouped import map_whole_groups

TransformFn = Callable[[pd.DataFrame, np.random.Generator], pd.DataFrame]


def rng_for(run_seed: int, conv_id: str) -> np.random.Generator:
    digest = hashlib.blake2b(
        f"{run_seed}:{conv_id}".encode(), digest_size=8
    ).digest()
    return np.random.default_rng(int.from_bytes(digest, "little"))


# --- transform kernels (pandas in, pandas out; one conversation) ----------


def bias_removal(cfg: dict) -> TransformFn:
    """``apply_bias_removal`` (preprocessing.py:43-70): if the 4th turn
    exceeds 1300 chars, drop turns 4 and 6, then resample the (new) 4th
    turn's length from the empirical distribution."""
    emp = np.asarray(cfg.get("empirical_lengths", [120, 240, 480]), dtype=np.int64)

    def fn(g: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
        if len(g) > 3 and g.iloc[3][S.N_CHARS] > 1300:
            g = g.drop(index=g.index[3]).reset_index(drop=True)
            if len(g) > 4:
                g = g.drop(index=g.index[4]).reset_index(drop=True)
        if len(g) > 3:
            g.loc[g.index[3], S.N_CHARS] = int(rng.choice(emp))
        return g

    return fn


def decorrelation(cfg: dict) -> TransformFn:
    """``apply_decorrelation_attack`` (preprocessing.py:72-92): replace
    the 3→4 inter-turn gap with a lognormal draw, shifting turns ≥ 4."""
    mean = float(cfg.get("timing_mean", -2.0))
    std = float(cfg.get("timing_std", 1.0))

    def fn(g: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
        if len(g) > 3:
            new_gap = rng.lognormal(mean=mean, sigma=std)
            old_gap = g.iloc[3]["_ts_sec"] - g.iloc[2]["_ts_sec"]
            adj = old_gap - new_gap
            idx = g.index[3:]
            g.loc[idx, "_ts_sec"] = g.loc[idx, "_ts_sec"] - adj
        return g

    return fn


def targeted_padding(n_turns: int = 5, pad_size: int = 64) -> TransformFn:
    """``apply_targeted_padding`` (preprocessing.py:95-115): add 1..pad
    chars to each of the first n turns."""

    def fn(g: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
        m = min(len(g), n_turns)
        if m:
            pads = rng.integers(1, pad_size + 1, size=m)
            g.loc[g.index[:m], S.N_CHARS] = g[S.N_CHARS].iloc[:m].to_numpy() + pads
        return g

    return fn


def ipd_jitter(n_turns: int = 5, max_delay_s: float = 0.5) -> TransformFn:
    """``apply_ipd_jitter`` (preprocessing.py:117-139): cumulative
    random delays after each of the first n turns."""

    def fn(g: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
        m = min(len(g) - 1, n_turns)
        if m <= 0:
            return g
        jit = rng.uniform(0, max_delay_s, size=m)
        shift = np.zeros(len(g))
        for i in range(m):
            shift[i + 1 :] += jit[i]
        g["_ts_sec"] = g["_ts_sec"].to_numpy() + shift
        return g

    return fn


def reshaping(split_threshold: int = 1000, max_splits: int = 3, min_size: int = 128) -> TransformFn:
    """``apply_packet_reshaping`` (preprocessing.py:142-195): split
    oversized turns into 2..max random Dirichlet segments, preserving
    total chars; segments offset by 1 µs to preserve order."""

    def fn(g: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
        rows = []
        for _, row in g.iterrows():
            n = int(row[S.N_CHARS])
            if n > split_threshold:
                k = int(rng.integers(2, max_splits + 1))
                shares = rng.dirichlet(np.ones(k))
                seg = np.maximum(
                    np.round(shares * (n - k * min_size)).astype(int) + min_size, min_size
                )
                seg[-1] = n - seg[:-1].sum()
                for i, sl in enumerate(seg):
                    r = row.copy()
                    r[S.N_CHARS] = int(sl)
                    r["_ts_sec"] = row["_ts_sec"] + i * 1e-6
                    rows.append(r)
            else:
                rows.append(row)
        out = pd.DataFrame(rows).sort_values("_ts_sec", kind="stable").reset_index(drop=True)
        return out

    return fn


def apply_transforms(
    df: DataFrame,
    transforms: list[TransformFn],
    pkt_limit: int = 20,
    run_seed: int = 42,
) -> DataFrame:
    """Apply a transform chain per conversation (grouped-map, seeded).

    Output schema = input schema with ``n_chars``/``ts`` updated and
    ``text`` re-synthesized to the new length (only length feeds the
    feature kernels). ``turn_idx`` is renumbered canonically after
    row-count-changing transforms.
    """
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.schema import with_derived

    d = df
    if S.N_CHARS not in d.columns:
        d = with_derived(d)
    d = d.withColumn("_ts_sec", F.col(S.TS_SEC))

    in_cols = [S.FOLDER, S.SOURCE, S.CONV, S.TURN, S.ROLE, S.TOOL, S.TS, S.N_CHARS, "_ts_sec"]
    sel = d.select(*in_cols)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv, g in pdf.groupby(S.CONV, sort=False):
            g = g.reset_index(drop=True)
            if len(g) >= pkt_limit:
                rng = rng_for(run_seed, str(conv))
                for t in transforms:
                    g = t(g, rng).reset_index(drop=True)
                g[S.TURN] = np.arange(len(g), dtype=np.int32)
            out.append(g)
        res = pd.concat(out, ignore_index=True)
        base = res[S.TS].groupby(res[S.CONV]).transform("min")
        base_sec = res["_ts_sec"].groupby(res[S.CONV]).transform("min")
        res[S.TS] = base + np.round((res["_ts_sec"] - base_sec) * 1e6).astype(
            "timedelta64[us]"
        )
        res[S.TEXT] = ["x" * int(n) for n in res[S.N_CHARS]]
        return res[[S.FOLDER, S.SOURCE, S.CONV, S.TURN, S.ROLE, S.TEXT, S.TOOL, S.TS]]

    return map_whole_groups(sel, kernel, S.TRANSCRIPT_SCHEMA)
