"""Deduplication operators for training-data pipelines.

- ``exact_dedup``: content hash-groupBy (exact; fully distributed).
- ``jaccard_pairs``: exact word-set Jaccard pairs via broadcast
  incidence matmul — the oracle-checkable baseline. Bounded by the
  broadcast corpus (docs × vocab bits); beyond that use LSH.
- ``minhash_lsh_candidates``: shingle → minhash → band → bucket-join,
  deterministic xxhash64 permutations — the 100 TB scale path.
- ``simhash_buckets``: 16..64-bit simhash bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(text_col, " "))).alias("w"),
    ).filter(F.length("w") > 0)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content: survivor id + copy count."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("copies")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold pairs (doc_a < doc_b).

    Incidence matrices multiply per Arrow batch against a broadcast
    corpus incidence — one integer matmul replaces the word-level
    self-join's quadratic shuffle.
    """
    spark = df.sparkSession
    sets = (
        _words(df, id_col, text_col)
        .groupBy("doc_id")
        .agg(F.collect_set("w").alias("ws"))
    )
    corpus = sets.toPandas()
    if corpus.empty:
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, jaccard double"
        )
    vocab: dict[str, int] = {}
    for ws in corpus["ws"]:
        for w in ws:
            vocab.setdefault(w, len(vocab))
    inc = np.zeros((len(corpus), len(vocab)), dtype=np.int32)
    for i, ws in enumerate(corpus["ws"]):
        inc[i, [vocab[w] for w in ws]] = 1
    all_ids = corpus["doc_id"].to_numpy()
    sizes = inc.sum(axis=1)
    b_vocab = spark.sparkContext.broadcast(vocab)
    b_inc = spark.sparkContext.broadcast(inc)
    b_ids = spark.sparkContext.broadcast(all_ids)
    b_sizes = spark.sparkContext.broadcast(sizes)

    def run(batches):
        vocab_, inc_, ids_, sizes_ = b_vocab.value, b_inc.value, b_ids.value, b_sizes.value
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.zeros((len(pdf), inc_.shape[1]), dtype=np.int32)
            for i, ws in enumerate(pdf["ws"]):
                q[i, [vocab_[w] for w in ws if w in vocab_]] = 1
            inter = q @ inc_.T
            qa = q.sum(axis=1)[:, None]
            union = qa + sizes_[None, :] - inter
            with np.errstate(all="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            qid = pdf["doc_id"].to_numpy()[:, None]
            mask = (jac >= threshold) & (qid < ids_[None, :])
            ai, bi = np.nonzero(mask)
            if not len(ai):
                continue
            yield pd.DataFrame(
                {
                    "doc_a": qid[ai, 0],
                    "doc_b": ids_[bi],
                    "jaccard": np.round(jac[ai, bi], round_digits),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_a", T.LongType()),
            T.StructField("doc_b", T.LongType()),
            T.StructField("jaccard", T.DoubleType()),
        ]
    )
    return sets.mapInPandas(run, schema=schema)


def minhash_lsh_candidates(
    df: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs: per-band signature equality join.

    Fully distributed (no broadcast): scales to arbitrary corpus size;
    band count trades recall vs candidate volume.
    """
    w = _words(df, id_col, text_col)
    mh = w.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.col("w"), F.lit(i))).alias(f"h{i}") for i in range(n_perm)]
    )
    rows_per_band = n_perm // bands
    bands_df = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{bi * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("sig"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash_buckets(
    df: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash bucket table: (simhash, n_docs, keep_id)."""
    w = _words(df, id_col, text_col)
    bit_cols = [
        F.when(F.shiftright(F.xxhash64("w"), i).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
        .alias(f"b{i}")
        for i in range(bits)
    ]
    sums = w.select("doc_id", *bit_cols).groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(bits)]
    )
    sim = sums.select(
        "doc_id",
        sum(
            [F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(bits)]
        ).alias("simhash"),
    )
    return sim.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id")
    )
