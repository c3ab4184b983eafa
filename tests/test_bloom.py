"""Bloom-filter membership: python-replay parity of the packed words,
the no-false-negatives guarantee, decontamination superset semantics,
and broadcast-probe plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.functions.bloom import (
    _BLOOM_OP,
    WORD_BITS,
    bloom_build,
    bloom_decontaminate,
    bloom_params,
    bloom_probe,
)
from proxyfeatureextraction_spark.operators.dedup import HASH_MOD, perm_params

KEYS = ["alpha", "beta", "gamma", "delta epsilon", "zeta", ""]
M_BITS = 1 << 10
K = 3


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 131 + ord(c)) % HASH_MOD
    return h


def _py_positions(s: str, m_bits: int = M_BITS, k: int = K) -> list[int]:
    h = _py_hash(s)
    out = []
    for i in range(k):
        a, b = perm_params(_BLOOM_OP + i)
        out.append((h * a + b) % HASH_MOD % m_bits)
    return out


def _py_bloom(keys, m_bits: int = M_BITS, k: int = K) -> dict[int, int]:
    words: dict[int, int] = {}
    for s in keys:
        for pos in _py_positions(s, m_bits, k):
            w, bit = pos // WORD_BITS, pos % WORD_BITS
            words[w] = words.get(w, 0) | (1 << bit)
    return words


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.createDataFrame([(s,) for s in KEYS], ["key"])


def test_build_matches_python_replay(spark, keys_df):
    got = {r["word"]: r["bits"] for r in bloom_build(keys_df, M_BITS, K).collect()}
    assert got == _py_bloom(KEYS)


def test_probe_no_false_negatives(spark, keys_df):
    out = bloom_probe(keys_df, bloom_build(keys_df, M_BITS, K), M_BITS, K)
    assert all(r["maybe"] for r in out.collect())


def test_probe_rejects_absent_keys_at_low_fpr(spark, keys_df):
    # m = 2^16 for 6 keys -> FP rate ~ (3*6/65536)^3, effectively 0
    m = 1 << 16
    bloom = bloom_build(keys_df, m, K)
    absent = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(200)], ["key"]
    )
    out = bloom_probe(absent, bloom, m, K).collect()
    assert not any(r["maybe"] for r in out)


def test_probe_preserves_payload_and_dup_rows(spark):
    df = spark.createDataFrame(
        [("alpha", 1), ("alpha", 2), ("nope", 3)], ["key", "payload"]
    )
    bloom = bloom_build(
        spark.createDataFrame([("alpha",)], ["key"]), M_BITS, K
    )
    rows = {
        (r["key"], r["payload"]): r["maybe"]
        for r in bloom_probe(df, bloom, M_BITS, K).collect()
    }
    assert rows[("alpha", 1)] and rows[("alpha", 2)]
    assert len(rows) == 3


def test_bloom_params_formulas():
    m, k = bloom_params(1000, 0.01)
    assert m == math.ceil(-1000 * math.log(0.01) / math.log(2) ** 2)
    assert k == round(m / 1000 * math.log(2))
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_build_validates_args(keys_df):
    for bad_m in (0, 31, 33):
        with pytest.raises(ValueError):
            bloom_build(keys_df, bad_m)
    with pytest.raises(ValueError):
        bloom_build(keys_df, M_BITS, k=0)


def test_decontaminate_superset_of_exact(spark):
    from proxyfeatureextraction_spark.operators.curation import decontaminate

    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),
            (2, "totally clean document with no overlap at all"),
            (3, "x y z " + "a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string"
    )
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, ev, n=8).collect()
    }
    bl = {
        r["doc_id"]: r
        for r in bloom_decontaminate(train, ev, n=8, m_bits=1 << 16).collect()
    }
    # no false negatives: every exact hit is a bloom hit; at this m the
    # tiny fixture has no false positives either
    for d, flag in exact.items():
        assert bl[d]["contaminated"] == flag
    assert bl[1]["n_grams"] == 2 and bl[1]["n_maybe"] == 1
    assert bl[2]["n_maybe"] == 0


def test_probe_plan_broadcast_and_jvm_only(spark, keys_df):
    out = bloom_probe(keys_df, bloom_build(keys_df, M_BITS, K), M_BITS, K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_null_key_decidable(spark):
    """A NULL key must still yield a boolean verdict: NULL hashes as
    '' on BOTH build and probe sides (a NULL hash would fall out of
    the position explode and come back as maybe=NULL, silently
    slipping past a ~maybe filter)."""
    from proxyfeatureextraction_spark.functions.bloom import (
        bloom_build,
        bloom_probe,
    )

    built = spark.createDataFrame([(None,), ("x",)], "key string")
    probe = spark.createDataFrame(
        [(None,), ("x",), ("unseen-key-zzz",)], "key string"
    )
    bloom = bloom_build(built, m_bits=1024, k=3)
    got = {r["key"]: r["maybe"] for r in bloom_probe(probe, bloom, 1024, 3).collect()}
    assert got[None] is True          # '' was inserted (via the NULL row)
    assert got["x"] is True
    assert got["unseen-key-zzz"] is False  # boolean, never NULL
