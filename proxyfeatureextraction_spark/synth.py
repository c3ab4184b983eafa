"""Deterministic synthetic transcript generator (FIXTURES.md §1/§6).

Seeded, pure-numpy row synthesis — no external data. The generated
table exercises every boundary the reference's own tests probe:
heavy-hitter conversations (skew/salting), >300 s intra-conversation
gaps (sessionize), role runs (direction-reversal triplets,
``thesis_extractor.py:55-67``), single-role conversations
(one-direction branches, ``hayes_usenix2019_features.py:93-100``),
exact K−1/K/K+1 turn counts for K ∈ {20, 50} (first-K gates,
``ta_extractor.py:45``, ``host_feature_helpers.py:16,66``),
>1300-char early turns (bias threshold, ``preprocessing.py:50``) and
duplicate timestamps (stable-ordering tiebreak).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from proxyfeatureextraction_spark import schema as S

EPOCH = np.datetime64("2025-01-01T00:00:00", "us")
_VOCAB = (
    "the quick brown fox jumps over a lazy dog while spark shuffles "
    "partitions across executors and catalyst prunes columns for free"
).split()


def _turn_counts(rng: np.random.Generator, n_convs: int, heavy_hitters: int) -> np.ndarray:
    n = np.clip(rng.lognormal(mean=np.log(30.0), sigma=0.75, size=n_convs), 3, 400).astype(
        np.int64
    )
    # limit-boundary conversations for K in {20, 50}
    boundary = [19, 20, 21, 49, 50, 51]
    for i, b in enumerate(boundary):
        if i < n_convs:
            n[i] = b
    # heavy hitters: 10-50x the median (exercises salted aggregation)
    for i in range(heavy_hitters):
        j = len(boundary) + i
        if j < n_convs:
            n[j] = int(30 * (10 + 40 * rng.random()))
    return n


def _text_from_len(lengths: np.ndarray, rng: np.random.Generator) -> list[str]:
    # deterministic pseudo-text of ~exactly the requested char length
    base = " ".join(_VOCAB)
    big = (base + " ") * (4000 // len(base) + 2)
    starts = rng.integers(0, len(_VOCAB), size=len(lengths))
    out = []
    for ln, st in zip(lengths.tolist(), starts.tolist()):
        off = sum(len(w) + 1 for w in _VOCAB[:st])
        out.append(big[off : off + ln])
    return out


def synth_transcripts_pdf(
    n_convs: int = 200,
    seed: int = 42,
    heavy_hitters: int = 3,
    convs_per_folder: int = 50,
    with_text: bool = True,
) -> pd.DataFrame:
    """Generate the transcript table as pandas (test scale).

    Columns: folder_name, source, conv_id, turn_idx, role, text, tool,
    ts (datetime64[us]). Deterministic for a given (n_convs, seed).
    """
    rng = np.random.default_rng(seed)
    counts = _turn_counts(rng, n_convs, heavy_hitters)
    total = int(counts.sum())
    conv_idx = np.repeat(np.arange(n_convs), counts)
    turn_idx = np.concatenate([np.arange(c) for c in counts]).astype(np.int32)

    # --- timestamps: conv start + cumulative lognormal gaps ----------------
    folder_of_conv = np.arange(n_convs) // convs_per_folder
    conv_start = folder_of_conv * 3600.0 + rng.uniform(0, 600.0, size=n_convs)
    gaps = rng.lognormal(mean=np.log(2.0), sigma=1.0, size=total)
    gaps[turn_idx == 0] = 0.0
    # occasional session-boundary gaps (> 300 s) and duplicate-ts pairs
    mark = rng.random(total)
    gaps = np.where((mark < 0.01) & (turn_idx > 0), gaps + 400.0, gaps)
    gaps = np.where((mark > 0.98) & (turn_idx > 0), 0.0, gaps)
    # per-conv cumulative sum without a Python loop over rows
    cum = np.cumsum(gaps)
    conv_first_row = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ts_sec = cum - np.repeat(cum[conv_first_row], counts) + np.repeat(conv_start, counts)

    # --- roles: alternating with runs; some single-role convs --------------
    flip = (rng.random(total) < 0.7).astype(np.int64)
    flip[turn_idx == 0] = 0
    parity = np.cumsum(flip)
    parity -= np.repeat(parity[conv_first_row], counts)
    role = np.where(parity % 2 == 0, "user", "assistant").astype(object)
    tool_turn = (role == "assistant") & (rng.random(total) < 0.2)
    role[tool_turn] = "tool"
    single_role = np.repeat((np.arange(n_convs) % 37) == 8, counts)
    role[single_role] = "user"
    # a single-role conv has no tool turns left — clear the mask so the
    # fixture can't emit user rows carrying tool values (a state no
    # real transcript produces; it was polluting the single-role branch
    # these convs exist to exercise)
    tool_turn &= ~single_role

    tool = np.where(
        tool_turn, np.where(rng.random(total) < 0.5, "search", "exec"), None
    )

    # --- text lengths: 20..4000, heavy tail; force >1300 at turn 3 sometimes
    lens = np.clip(rng.lognormal(mean=np.log(120.0), sigma=1.0, size=total), 20, 4000).astype(
        np.int64
    )
    big4 = np.repeat((np.arange(n_convs) % 11) == 5, counts) & (turn_idx == 3)
    lens = np.where(big4, 1400 + (lens % 600), lens)

    pdf = pd.DataFrame(
        {
            S.FOLDER: np.char.add("folder_", folder_of_conv.astype("U8"))[conv_idx],
            S.SOURCE: np.array(S.SOURCES, dtype=object)[conv_idx % 3],
            S.CONV: np.char.add("conv_", np.arange(n_convs).astype("U8"))[conv_idx],
            S.TURN: turn_idx,
            S.ROLE: role,
            S.TOOL: tool,
            "_len": lens,
            "_ts_sec": ts_sec,
        }
    )
    pdf[S.TS] = EPOCH + (ts_sec * 1e6).astype("timedelta64[us]")
    if with_text:
        pdf[S.TEXT] = _text_from_len(lens, np.random.default_rng(seed + 1))
        pdf = pdf.drop(columns=["_len"])
    else:
        pdf = pdf.rename(columns={"_len": "n_chars_target"})
    return pdf.drop(columns=["_ts_sec"])


def synth_transcripts(spark, n_convs: int = 200, seed: int = 42, **kw):
    """Small-scale Spark DataFrame with full text (tests / oracle parity)."""
    pdf = synth_transcripts_pdf(n_convs=n_convs, seed=seed, **kw)
    cols = [S.FOLDER, S.SOURCE, S.CONV, S.TURN, S.ROLE, S.TEXT, S.TOOL, S.TS]
    return spark.createDataFrame(pdf[cols], schema=S.TRANSCRIPT_SCHEMA)


def synth_bench_parquet(
    spark,
    path: str,
    n_convs: int = 20000,
    seed: int = 42,
    heavy_hitters: int = 10,
    partitions: int = 64,
) -> str:
    """Bench-scale generator: numeric skeleton in pandas, text expanded
    JVM-side (``repeat``) so generation doesn't bottleneck in Python.

    Only ``length(text)`` feeds the feature kernels, so constant-char
    text of the right length is behaviorally equivalent at bench scale.
    """
    from pyspark.sql import functions as F

    pdf = synth_transcripts_pdf(
        n_convs=n_convs, seed=seed, heavy_hitters=heavy_hitters, with_text=False
    )
    df = (
        spark.createDataFrame(pdf)
        .withColumn(S.TEXT, F.expr("repeat('x', n_chars_target)"))
        .drop("n_chars_target")
        .select(S.FOLDER, S.SOURCE, S.CONV, S.TURN, S.ROLE, S.TEXT, S.TOOL, S.TS)
    )
    df.repartition(partitions, S.CONV).write.mode("overwrite").parquet(path)
    return path


def synth_bench_parquet_distributed(
    spark,
    path: str,
    n_convs: int = 1_200_000,
    seed: int = 42,
    block_convs: int = 5000,
    partitions: int | None = None,
) -> str:
    """Cluster-scale deterministic generator: one task per block of
    conversations, each block produced by the same seeded routine
    (seed + block index), so output is identical for any partitioning.
    Generates tens of millions of turns without a driver bottleneck.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    n_blocks = (n_convs + block_convs - 1) // block_convs
    blocks = spark.range(n_blocks).repartition(partitions or n_blocks)

    def gen(batches):
        for pdf in batches:
            for block in pdf["id"].tolist():
                out = synth_transcripts_pdf(
                    n_convs=min(block_convs, n_convs - block * block_convs),
                    seed=seed + int(block),
                    heavy_hitters=2,
                    with_text=False,
                )
                out[S.CONV] = f"b{block}_" + out[S.CONV].astype(str)
                out[S.FOLDER] = f"b{block}_" + out[S.FOLDER].astype(str)
                yield out

    skeleton_schema = (
        "folder_name string, source string, conv_id string, turn_idx int, "
        "role string, tool string, n_chars_target long, ts timestamp"
    )
    df = (
        blocks.mapInPandas(gen, schema=skeleton_schema)
        .withColumn(S.TEXT, F.expr("repeat('x', n_chars_target)"))
        .drop("n_chars_target")
        .select(S.FOLDER, S.SOURCE, S.CONV, S.TURN, S.ROLE, S.TEXT, S.TOOL, S.TS)
    )
    df.write.mode("overwrite").parquet(path)
    return path
