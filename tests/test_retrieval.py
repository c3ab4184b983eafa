"""Retrieval leg: BM25 / tf-idf / inverted index — python-replay
parity, determinism of tie-breaks, the df cap's pre-collect pruning,
and JVM-only plan shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark.functions.retrieval import (
    bm25_search,
    inverted_index,
    tfidf_keywords,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lazy dog sleeps all day the dog"),
    (3, "quick quick quick brown"),
    (4, ""),
    (5, "unique singleton sentence"),
]


def _tok(t):
    return [w for w in t.split(" ") if w]


def _py_bm25(query, k1=1.2, b=0.75):
    corpus = {d: _tok(t) for d, t in DOCS if _tok(t)}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    terms = sorted(set(_tok(query)))
    scores = {}
    for d, toks in corpus.items():
        s, hit = 0.0, 0
        for w in terms:
            tf = toks.count(w)
            if not tf:
                continue
            hit += 1
            dfreq = sum(1 for v in corpus.values() if w in v)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if hit:
            scores[d] = (hit, s)
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_matches_python_replay(docs_df):
    got = {
        r["doc_id"]: r for r in bm25_search(docs_df, "quick dog", top_k=10).collect()
    }
    exp = _py_bm25("quick dog")
    assert set(got) == set(exp)
    for d, (hit, s) in exp.items():
        assert got[d]["n_hit"] == hit
        assert got[d]["score"] == pytest.approx(s, rel=1e-12)


def test_bm25_ordering_and_topk(docs_df):
    rows = bm25_search(docs_df, "quick dog", top_k=2).collect()
    exp = sorted(_py_bm25("quick dog").items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [r["doc_id"] for r in rows] == [d for d, _ in exp[:2]]


def test_bm25_rejects_empty_query(docs_df):
    with pytest.raises(ValueError):
        bm25_search(docs_df, "   ")


def test_tfidf_matches_python_replay(docs_df):
    corpus = {d: _tok(t) for d, t in DOCS if _tok(t)}
    n = len(corpus)
    got = {}
    for r in tfidf_keywords(docs_df, top_m=2).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for d, toks in corpus.items():
        scored = []
        for w in sorted(set(toks)):
            dfreq = sum(1 for v in corpus.values() if w in v)
            idf = math.log((1 + n) / (1 + dfreq)) + 1
            scored.append((w, toks.count(w), toks.count(w) * idf))
        scored.sort(key=lambda x: (-x[2], x[0]))
        rows = sorted(got[d], key=lambda r: r["rank"])
        assert [(r["w"], r["tf"]) for r in rows] == [
            (w, tf) for w, tf, _ in scored[:2]
        ]
        for r, (_, _, s) in zip(rows, scored[:2]):
            assert r["score"] == pytest.approx(s, rel=1e-12)


def test_inverted_index_postings_and_cap(docs_df):
    # max_df=2: "the" (docs 0,1,2) and "quick" (0,1,3) must be pruned
    got = {r["w"]: r for r in inverted_index(docs_df, max_df=2).collect()}
    assert "the" not in got and "quick" not in got
    assert got["dog"]["df"] == 2 and got["dog"]["postings"] == "0,2"
    assert got["fox"]["postings"] == "0,1"
    assert got["singleton"]["df"] == 1 and got["singleton"]["postings"] == "5"
    # per-doc dedup: doc 2 repeats "dog" but posts once
    assert got["sleeps"]["postings"] == "2"


def test_inverted_index_cap_prunes_before_collect(docs_df):
    plan = (
        inverted_index(docs_df, max_df=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the df filter must sit on the count aggregate (a join input),
    # not above the collect_list aggregate
    assert "collect_list" in plan
    before, _, after = plan.partition("collect_list")
    assert "(df#" not in before  # no post-collect filter
    assert plan.count("Join") >= 1


def test_plans_jvm_only(docs_df):
    for out in (
        bm25_search(docs_df, "quick dog"),
        tfidf_keywords(docs_df),
        inverted_index(docs_df, max_df=2),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_no_global_sort(docs_df):
    plan = (
        bm25_search(docs_df, "quick dog", top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
