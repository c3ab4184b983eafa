"""Distributed Bloom-filter membership (Bloom 1970; Broder & Mitzenmacher
2004 survey): build a bit array AS A DATAFRAME and probe it with a
broadcast join — constant-size membership state for "have we seen this
key before?" questions that a 100 TB pipeline cannot answer with a join
against the full historic corpus.

The filter is a table ``(word, bits)``: ``word = position // 32`` and
``bits`` the OR of ``1 << (position % 32)`` masks — at ``m = 2^20``
bits that is at most 32,768 rows of two longs, which BROADCASTS no
matter how many billions of keys were folded into it.  Build is one
explode + one map-side-partial ``bit_or`` aggregate; probe is a
broadcast join.  32-bit packing (not 64) keeps every mask strictly
positive in int64 on every engine, so the packed words compare and
serialize identically across Spark / DuckDB / parquet consumers.

Hashing is the engine's portable polynomial word hash (mod 1e9+7) with
the affine permutation family — bit-identical in DuckDB SQL, which is
what makes the Bloom gates full value oracles.  The permutation indices
are offset by ``_BLOOM_OP`` so Bloom positions never correlate with the
MinHash family's buckets on the same corpus (same domain-separation
rule as the hash-threshold operators).

No false negatives, ever; false positives at the standard
``(1 - e^{-kn/m})^k`` rate — callers that need exactness use the Bloom
pass as a cheap pre-filter and verify survivors exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.operators.dedup import (
    HASH_MOD,
    _shingle_col,
    perm_params,
    portable_word_hash,
)

#: bits per packed word — 32 keeps ``1 << bit`` positive in int64
WORD_BITS = 32
#: permutation-family offset: Bloom's (a, b) params never collide with
#: the MinHash permutations (domain separation across operators)
_BLOOM_OP = 4096


def bloom_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Standard sizing: optimal ``(m_bits, k)`` for ``n_items`` keys at
    target false-positive rate ``fpr`` (m = -n ln p / ln2²,
    k = (m/n) ln2). Driver-side arithmetic only."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = max(WORD_BITS, int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _positions_from_hash(h, m_bits: int, k: int) -> "F.Column":
    """Array of k bit positions in [0, m_bits) for a precomputed
    polynomial hash ``h`` — every downstream bit depends on the key
    only through ``h``, which is what lets build/probe dedupe and join
    on the int instead of the key text."""
    return F.array(
        *[
            (h * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD) % F.lit(m_bits)
            for a, b in (perm_params(_BLOOM_OP + i) for i in range(k))
        ]
    )


def _positions(key_col, m_bits: int, k: int) -> "F.Column":
    """Array of the key's k bit positions in [0, m_bits)."""
    return _positions_from_hash(portable_word_hash(key_col), m_bits, k)


def bloom_build(
    df: DataFrame, m_bits: int, k: int = 3, key_col: str = "key"
) -> DataFrame:
    """Fold ``df[key_col]`` (strings) into a Bloom filter:
    ``(word, bits)`` rows, at most ``m_bits / 32`` of them.

    One explode (k positions per key) + one ``bit_or`` aggregate that
    partially combines map-side — the exchange carries at most
    ``m_bits / 32`` rows per task regardless of input size.
    """
    # NULL-safe: NULL keys hash as '' on BOTH build and probe sides,
    # so every row gets a decidable boolean verdict (a NULL hash would
    # silently drop out of the explode and come back as maybe=NULL)
    hs = df.select(
        portable_word_hash(F.coalesce(F.col(key_col), F.lit(""))).alias("_bh")
    )
    return _bloom_build_hashes(hs, m_bits, k)


def _bloom_build_hashes(hs: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Build from a ``(_bh)`` hash column — the key text is already
    gone by the time anything explodes or shuffles."""
    if m_bits < WORD_BITS or m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        hs.select(
            F.explode(_positions_from_hash(F.col("_bh"), m_bits, k)).alias("pos")
        )
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    m_bits: int,
    k: int = 3,
    key_col: str = "key",
) -> DataFrame:
    """Append ``maybe`` (boolean) to ``df``: true iff all ``k`` of the
    key's bits are set — key was possibly inserted (false positives at
    the Bloom rate, never false negatives).

    ``maybe`` is a function of the key's polynomial hash ALONE, so the
    verdict is computed once per DISTINCT hash (the filter broadcasts;
    each hash explodes to its k positions and is "maybe" iff every
    position found its bit) and joined back on the int — duplicate
    keys cost one distinct-exchange row, and the key text never keys
    an exchange (the join-back shuffles on an 8-byte hash).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = df.withColumn(
        "_bh", portable_word_hash(F.coalesce(F.col(key_col), F.lit("")))
    )
    verdicts = _probe_hashes(keyed.select("_bh").distinct(), bloom, m_bits, k)
    return keyed.join(verdicts, "_bh", "left").drop("_bh")


def _probe_hashes(
    hs: DataFrame, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """(_bh, maybe) for each distinct hash in ``hs``."""
    return (
        hs.select("_bh", F.explode(_positions_from_hash(F.col("_bh"), m_bits, k)).alias("pos"))
        .select(
            "_bh",
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias(
                "_mask"
            ),
        )
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("_bh")
        .agg(
            (
                F.count(F.lit(1))
                == F.sum(
                    F.when(
                        F.col("bits").isNotNull()
                        & (F.col("bits").bitwiseAND(F.col("_mask")) == F.col("_mask")),
                        1,
                    ).otherwise(0)
                )
            ).alias("maybe")
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 18,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination against a Bloom filter of the eval
    set's word ``n``-grams: ``(doc_id, n_grams, n_maybe, contaminated)``
    for every train doc.

    Same shape as ``decontaminate`` but the eval side folds into a
    CONSTANT-size filter instead of a broadcast shingle set — the route
    when the "eval" side is itself huge (e.g. membership against a
    historic corpus digest list, where the exact distinct shingle set
    would not broadcast).  ``contaminated`` is a SUPERSET of the exact
    operator's flag (Bloom false positives, never negatives): use it as
    the cheap first pass and verify flagged survivors exactly.

    Digest-keyed end-to-end: grams hash in the same stage as the
    explode, so every exchange (the eval distinct, the per-hash probe,
    the verdict join-back, the per-doc agg) carries 8-byte ints plus
    the doc id — gram text never shuffles.
    """
    ev_h = (
        eval_df.select(
            F.explode(F.array_distinct(_shingle_col(text_col, n))).alias("g")
        )
        .select(portable_word_hash(F.col("g")).alias("_bh"))
        .distinct()
    )
    bloom = _bloom_build_hashes(ev_h, m_bits, k)
    tr_h = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingle_col(text_col, n))).alias("g"),
    ).select("doc_id", portable_word_hash(F.col("g")).alias("_bh"))
    verdicts = _probe_hashes(tr_h.select("_bh").distinct(), bloom, m_bits, k)
    per_doc = tr_h.join(verdicts, "_bh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0)).alias("n_maybe"),
    )
    return (
        train.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_maybe", F.lit(0)).alias("n_maybe"),
            (F.coalesce("n_maybe", F.lit(0)) > 0).alias("contaminated"),
        )
    )
