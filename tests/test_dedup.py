"""Dedup operators: skew guards and fail-fast bounds.

The value-correctness of the dedup family is driver-gated
(dedup_exact / dedup_jaccard / dedup_minhash_lsh / dedup_simhash all
have DuckDB oracles in __spark_entry__). These tests pin the SCALE
behavior: degenerate corpora must not produce quadratic joins or
unbounded driver collects.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_candidates,
)


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    """300 DISTINCT texts sharing one word set (word-order permutations:
    identical minhash in every permutation → one hot bucket per band),
    200 exact copies of one text, and 20 normal near-dup docs."""
    import itertools

    words = [f"tok{i}" for i in range(12)]
    rows = []
    perms = itertools.permutations(words)
    for i in range(300):
        rows.append((i, " ".join(next(perms))))
    for i in range(300, 500):
        rows.append((i, "exact copy of this spam document"))
    for i in range(500, 520):
        extra = "" if i % 2 else " unique" + str(i)
        rows.append((i, "the quick brown fox jumps over the lazy dog" + extra))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_cap_bounds_candidates(adversarial_docs):
    # uncapped: the 300 same-word-set docs collide in every band
    # (300·299/2 pairs); the cap drops those buckets entirely.
    uncapped = minhash_lsh_candidates(adversarial_docs, max_bucket=None)
    capped = minhash_lsh_candidates(adversarial_docs, max_bucket=50)
    n_uncapped, n_capped = uncapped.count(), capped.count()
    assert n_uncapped >= 300 * 299 / 2
    # capped output is bounded by cap²/2 per surviving bucket — the hot
    # group is gone, only the small near-dup group can pair up
    assert n_capped <= 50 * 49 / 2
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert all(a >= 500 and b >= 500 for a, b in pairs)


def test_exact_copies_collapse_before_hashing(adversarial_docs):
    """200 exact copies produce ZERO candidate pairs among themselves
    (they collapse to one representative — exact_dedup owns them)."""
    cands = minhash_lsh_candidates(adversarial_docs, max_bucket=None)
    exact_ids = set(range(300, 500))
    both_exact = cands.filter(
        F.col("doc_a").isin(exact_ids) & F.col("doc_b").isin(exact_ids)
    )
    assert both_exact.count() == 0


def test_jaccard_guard_fails_fast(adversarial_docs):
    with pytest.raises(ValueError, match="minhash_lsh_candidates"):
        jaccard_pairs(adversarial_docs, max_docs=10).count()
    # vocab bound triggers independently
    with pytest.raises(ValueError, match="vocab"):
        jaccard_pairs(adversarial_docs, max_docs=100_000, max_vocab=5).count()


def test_jaccard_guard_disabled_still_works(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = jaccard_pairs(df, max_docs=None).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2)}
