"""CCNet-style bigram-LM scoring: hand-replay parity on a tiny corpus,
smoothing totality, empty-doc handling, and the JVM-only plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.functions.lm import (
    BOS,
    lm_cross_entropy,
    ngram_lm_counts,
)

REF = [
    (0, "the quick fox jumps over the lazy dog"),
    (1, "the quick dog sleeps under the warm sun"),
    (2, "a lazy fox naps while the dog runs"),
]
SCORED = REF + [
    (3, "the quick fox runs"),          # in-vocabulary
    (4, "zebras quantize gradients"),   # fully out-of-vocabulary
    (5, ""),                            # empty
]


def _py_lm(ref_texts):
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    vocab = set()
    for t in ref_texts:
        toks = [BOS] + [w for w in t.split(" ") if w]
        for w1, w2 in zip(toks, toks[1:]):
            uni[w1] = uni.get(w1, 0) + 1
            bi[(w1, w2)] = bi.get((w1, w2), 0) + 1
            vocab.add(w2)
    return uni, bi, len(vocab)


def _py_ce(text, uni, bi, v):
    toks = [BOS] + [w for w in text.split(" ") if w]
    lps = [
        math.log(bi.get((w1, w2), 0) + 1) - math.log(uni.get(w1, 0) + v)
        for w1, w2 in zip(toks, toks[1:])
    ]
    return -sum(lps) / len(lps) if lps else None


@pytest.fixture(scope="module")
def lm_result(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(SCORED, ["doc_id", "text"])
    lm = ngram_lm_counts(ref)
    out = lm_cross_entropy(docs, lm)
    return {r["doc_id"]: r for r in out.collect()}


def test_matches_python_replay(lm_result):
    uni, bi, v = _py_lm([t for _, t in REF])
    for did, text in SCORED:
        exp = _py_ce(text, uni, bi, v)
        got = lm_result[did]["ce"]
        if exp is None:
            assert got is None
        else:
            assert got == pytest.approx(exp, rel=1e-12), (did, text)
            assert lm_result[did]["ppl"] == pytest.approx(
                math.exp(exp), rel=1e-12
            )


def test_smoothing_is_total_and_oov_scores_worse(lm_result):
    # fully-OOV doc still gets a finite score, and a worse (higher) one
    # than the in-vocabulary doc
    assert lm_result[4]["ce"] is not None
    assert math.isfinite(lm_result[4]["ce"])
    assert lm_result[4]["ce"] > lm_result[3]["ce"]


def test_counts_and_empty_doc(lm_result):
    assert lm_result[5]["n_tok"] == 0
    assert lm_result[5]["ce"] is None and lm_result[5]["ppl"] is None
    # n_tok counts real tokens (one bigram per token via the <s> prefix)
    assert lm_result[3]["n_tok"] == 4


def test_vocab_and_context_counts(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    lm = ngram_lm_counts(ref)
    uni, bi, v = _py_lm([t for _, t in REF])
    assert lm["vocab"].collect()[0]["v"] == v
    got_uni = {r["w1"]: r["c1"] for r in lm["uni"].collect()}
    assert got_uni == uni
    # <s> context count = number of reference documents
    assert got_uni[BOS] == len(REF)


def test_plan_jvm_only_and_broadcast(spark):
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(SCORED, ["doc_id", "text"])
    out = lm_cross_entropy(docs, ngram_lm_counts(ref))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_large_bigram_table_not_broadcast(spark):
    """Size gate (r5 verdict #1): past ``broadcast_max_rows`` the bigram
    count table must NOT be forced into a broadcast — the scoring join
    falls back to a plain shuffle equi-join on (w1, w2). Values must be
    identical on both paths."""
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(SCORED, ["doc_id", "text"])
    lm = ngram_lm_counts(ref)
    small = lm_cross_entropy(docs, lm)
    big = lm_cross_entropy(docs, lm, broadcast_max_rows=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    # the only remaining broadcast on the gated path is the one-row
    # vocab crossJoin — no broadcast hash join over the count tables
    assert "BroadcastHashJoin" not in plan
    a = {r["doc_id"]: (r["n_tok"], r["ce"], r["ppl"]) for r in small.collect()}
    b = {r["doc_id"]: (r["n_tok"], r["ce"], r["ppl"]) for r in big.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        for x, y in zip(a[k][1:], b[k][1:]):
            assert (x is None) == (y is None)
            if x is not None:
                assert abs(x - y) < 1e-12


BUCKET_DOCS = [
    # two groups with enough spread for distinct terciles
    (10, "en", "the quick fox runs"),
    (11, "en", "the quick dog sleeps under the warm sun"),
    (12, "en", "a lazy fox naps while the dog runs"),
    (13, "en", "zebras quantize gradients"),
    (14, "en", "the quick fox jumps over the lazy dog"),
    (15, "en", "quantum zebras over gradients runs sun"),
    (16, "xx", "the quick fox"),
    (17, "xx", "gradient descent diverges"),
    (18, "xx", "the lazy dog sleeps"),
    (19, "en", ""),  # empty: NULL bucket, no vote on cutoffs
]


def _interp_percentile(vals, p):
    vals = sorted(vals)
    pos = (len(vals) - 1) * p
    lo = int(math.floor(pos))
    frac = pos - lo
    hi = min(lo + 1, len(vals) - 1)
    return vals[lo] + (vals[hi] - vals[lo]) * frac


@pytest.fixture(scope="module")
def bucketed(spark):
    from proxyfeatureextraction_spark.functions.lm import ppl_buckets

    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(BUCKET_DOCS, ["doc_id", "lang", "text"])
    out = ppl_buckets(docs, ngram_lm_counts(ref))
    return {r["doc_id"]: r for r in out.collect()}


def test_ppl_buckets_match_python_replay(bucketed):
    by_lang: dict[str, list[float]] = {}
    for did, r in bucketed.items():
        if r["ppl6"] is not None:
            by_lang.setdefault(r["lang"], []).append(r["ppl6"])
    for did, r in bucketed.items():
        if r["ppl6"] is None:
            assert r["bucket"] is None
            continue
        c1 = _interp_percentile(by_lang[r["lang"]], 1 / 3)
        c2 = _interp_percentile(by_lang[r["lang"]], 2 / 3)
        exp = "head" if r["ppl6"] <= c1 else "middle" if r["ppl6"] <= c2 else "tail"
        assert r["bucket"] == exp, (did, r["ppl6"], c1, c2)


def test_ppl_buckets_ordered_within_group(bucketed):
    rank = {"head": 0, "middle": 1, "tail": 2}
    rows = [r for r in bucketed.values() if r["bucket"] is not None]
    for a in rows:
        for b in rows:
            if a["lang"] == b["lang"] and a["ppl6"] < b["ppl6"]:
                assert rank[a["bucket"]] <= rank[b["bucket"]]
    # every group with >= 3 docs uses all three buckets at this spread
    en = {r["bucket"] for r in rows if r["lang"] == "en"}
    assert en == {"head", "middle", "tail"}


def test_ppl_buckets_no_global_window(spark):
    from proxyfeatureextraction_spark.functions.lm import ppl_buckets

    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    docs = spark.createDataFrame(BUCKET_DOCS, ["doc_id", "lang", "text"])
    plan = (
        ppl_buckets(docs, ngram_lm_counts(ref))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # cutoffs come from a groupBy aggregate broadcast back — a global
    # ntile/rank window would funnel the corpus into one partition
    assert "WindowExec" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
