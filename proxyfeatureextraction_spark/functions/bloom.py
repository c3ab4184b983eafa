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


def _positions(key_col, m_bits: int, k: int) -> "F.Column":
    """Array of the key's k bit positions in [0, m_bits)."""
    h = portable_word_hash(key_col)
    return F.array(
        *[
            (h * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD) % F.lit(m_bits)
            for a, b in (perm_params(_BLOOM_OP + i) for i in range(k))
        ]
    )


def bloom_build(
    df: DataFrame, m_bits: int, k: int = 3, key_col: str = "key"
) -> DataFrame:
    """Fold ``df[key_col]`` (strings) into a Bloom filter:
    ``(word, bits)`` rows, at most ``m_bits / 32`` of them.

    One explode (k positions per key) + one ``bit_or`` aggregate that
    partially combines map-side — the exchange carries at most
    ``m_bits / 32`` rows per task regardless of input size.
    """
    if m_bits < WORD_BITS or m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("pos"))
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

    The filter broadcasts; each key explodes to its k positions, joins
    the packed words, and is "maybe" iff every position found its bit.
    Zero full-data shuffles beyond the per-key regroup.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed = df.withColumn("_bp", _positions(F.col(key_col), m_bits, k))
    # no pre-distinct: duplicate key rows contribute identical position
    # sets, so the all-positions-hit equality below is unaffected and
    # the probe costs ONE map-side-partial exchange, not two
    probe = (
        keyed.select(key_col, F.explode("_bp").alias("pos"))
        .select(
            key_col,
            "pos",
            (F.col("pos") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))").alias(
                "_mask"
            ),
        )
        .join(F.broadcast(bloom), "word", "left")
        .groupBy(key_col)
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
    return keyed.drop("_bp").join(probe, key_col, "left")


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
    """
    ev = eval_df.select(
        F.explode(F.array_distinct(_shingle_col(text_col, n))).alias("g")
    ).distinct()
    bloom = bloom_build(ev, m_bits, k, key_col="g")
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingle_col(text_col, n))).alias("g"),
    )
    probed = bloom_probe(tr, bloom, m_bits, k, key_col="g")
    per_doc = probed.groupBy("doc_id").agg(
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
