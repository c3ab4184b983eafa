"""Naive Bayes quality classifier: python-replay parity, smoothing
totality, prior behavior on empty docs, separation on a planted
corpus, and the JVM-only broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.functions.nbc import nb_log_odds, nb_train

TRAIN = [
    (0, "pos", "clean well written prose with careful structure"),
    (1, "pos", "careful prose and clean structure with clear ideas"),
    (2, "pos", "well structured clear writing"),
    (3, "neg", "buy now click here spam spam offer"),
    (4, "neg", "click spam offer buy buy now"),
    (5, "neg", "offer offer spam click now"),
]
SCORE = [
    (10, "clean careful prose with clear structure"),   # pos-like
    (11, "spam click buy offer now"),                   # neg-like
    (12, "zebra quark nebula"),                         # fully OOV
    (13, ""),                                           # empty
]


def _py_model(rows):
    tok: dict[tuple[str, str], int] = {}
    n_c: dict[str, int] = {}
    n_d: dict[str, int] = {}
    vocab = set()
    for _, lbl, text in rows:
        n_d[lbl] = n_d.get(lbl, 0) + 1
        for w in text.split(" "):
            if not w:
                continue
            tok[(lbl, w)] = tok.get((lbl, w), 0) + 1
            n_c[lbl] = n_c.get(lbl, 0) + 1
            vocab.add(w)
    return tok, n_c, n_d, len(vocab)


def _py_log_odds(text, tok, n_c, n_d, v, pos="pos", neg="neg"):
    s = math.log(n_d[pos]) - math.log(n_d[neg])
    for w in text.split(" "):
        if not w:
            continue
        s += math.log(tok.get((pos, w), 0) + 1) - math.log(n_c[pos] + v)
        s -= math.log(tok.get((neg, w), 0) + 1) - math.log(n_c[neg] + v)
    return s


@pytest.fixture(scope="module")
def scored(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    model = nb_train(train)
    out = nb_log_odds(docs, model, "pos", "neg")
    return {r["doc_id"]: r for r in out.collect()}


def test_matches_python_replay(scored):
    tok, n_c, n_d, v = _py_model(TRAIN)
    for did, text in SCORE:
        exp = _py_log_odds(text, tok, n_c, n_d, v)
        assert scored[did]["log_odds"] == pytest.approx(exp, rel=1e-12), (
            did,
            text,
        )


def test_separation_and_keep_flag(scored):
    assert scored[10]["log_odds"] > 0 and scored[10]["keep"]
    assert scored[11]["log_odds"] < 0 and not scored[11]["keep"]


def test_oov_and_empty(scored):
    # OOV tokens cancel to the class-size asymmetry; score stays finite
    assert math.isfinite(scored[12]["log_odds"])
    # empty doc scores exactly the prior log-ratio (equal priors -> 0)
    assert scored[13]["n_tok"] == 0
    assert scored[13]["log_odds"] == pytest.approx(0.0, abs=1e-12)


def test_label_validation(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    with pytest.raises(ValueError):
        nb_log_odds(docs, nb_train(train), "pos", "pos")


def test_plan_jvm_only_broadcast(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "label", "text"])
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    out = nb_log_odds(docs, nb_train(train), "pos", "neg")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowExec" not in plan
