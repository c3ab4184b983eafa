"""Exact-substring dedup (Lee et al. 2021 shape): hand-checked span
semantics, a python k-gram replay on a randomized corpus, edge cases,
and the skew-immune plan shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.operators.dedup import (
    dedup_substrings,
    dup_substring_starts,
)

ROWS = [
    (1, "a b c d e f g h i j"),
    (2, "x x c d e f g h q r"),      # shares c d e f g h with doc 1
    (3, "c d e f g h"),              # entirely duplicated
    (4, "u v w"),                    # shorter than k
    (5, ""),                         # empty
    (6, "m n o p m n o p m n o p"),  # self-repeat
]


def _py_dedup(texts: dict[int, str], k: int, min_count: int = 2):
    """Independent replay: flag duplicate k-grams by joined text (not
    hash), merge covered positions, rebuild clean text."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in texts.items()}
    from collections import Counter

    c = Counter(
        " ".join(ts[i : i + k])
        for ts in toks.values()
        for i in range(len(ts) - k + 1)
    )
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if c[" ".join(ts[i : i + k])] >= min_count:
                covered.update(range(i, i + k))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        clean = " ".join(w for i, w in enumerate(ts) if i not in covered)
        out[d] = (len(ts), len(covered), spans, clean)
    return out


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {r["doc_id"]: r for r in dedup_substrings(df, k=4).collect()}


def test_hand_checked_spans(result):
    assert tuple(result[1])[1:] == (10, 6, 1, "a b i j")
    assert tuple(result[2])[1:] == (10, 6, 1, "x x q r")
    assert tuple(result[3])[1:] == (6, 6, 1, "")     # fully duplicated
    assert tuple(result[4])[1:] == (3, 0, 0, "u v w")  # < k tokens
    assert tuple(result[5])[1:] == (0, 0, 0, "")     # empty text
    assert tuple(result[6])[1:] == (12, 12, 1, "")   # self-repeat


def test_matches_python_replay_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = {}
    for d in range(40):
        n = rng.randint(0, 30)
        texts[d] = " ".join(rng.choice(vocab) for _ in range(n))
    # plant a literal shared phrase in a few docs
    phrase = "alpha beta gamma delta epsilon zeta"
    for d in (3, 17, 29):
        texts[d] = texts[d] + " " + phrase + " " + texts[(d + 1) % 40]
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tok"], r["n_dup_tok"], r["n_spans"], r["clean_text"])
        for r in dedup_substrings(df, k=5).collect()
    }
    assert got == _py_dedup(texts, k=5)


def test_min_count_raises_threshold(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_dup_tok"]
        for r in dedup_substrings(df, k=4, min_count=3).collect()
    }
    # the c..h phrase appears 3x (docs 1, 2, 3) -> still flagged;
    # doc 6's self-repeat grams appear at most 3x -> partially flagged
    assert got[1] == 6 and got[2] == 6 and got[3] == 6
    # "m n o p m n o p m n o p": gram starts 1..9; 'm n o p' rotations
    # each appear >= 2 but only some reach 3 occurrences
    assert 0 < got[6] <= 12


def test_starts_layer_and_validation(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    starts = dup_substring_starts(df, k=4).collect()
    by_doc: dict[int, list[int]] = {}
    for r in starts:
        by_doc.setdefault(r["doc_id"], []).append(r["i"])
    # c d e f g h at positions 3-8 -> dup 4-gram starts 3, 4, 5
    assert sorted(by_doc[1]) == [3, 4, 5]
    assert sorted(by_doc[3]) == [1, 2, 3]
    with pytest.raises(ValueError):
        dup_substring_starts(df, k=0)
    with pytest.raises(ValueError):
        dup_substring_starts(df, min_count=1)


def test_plan_no_windows_no_python(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    plan = (
        dedup_substrings(df, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
