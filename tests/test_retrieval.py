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


# ---------------------------------------------------------------------------
# tfidf_allpairs — exact all-pairs cosine with lossless prefix filtering
# ---------------------------------------------------------------------------

AP_DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha beta gamma delta"),          # exact dup of 0
    (2, "alpha beta gamma delta epsilon"),  # near dup of 0/1
    (3, "zeta eta theta iota"),
    (4, "zeta eta theta kappa"),            # near dup of 3
    (5, "completely different words here"),
    (6, "alpha zeta different kappa"),      # mixes clusters, low sim
    (7, ""),
]


def _py_allpairs(threshold):
    corpus = {d: _tok(t) for d, t in AP_DOCS if _tok(t)}
    n = len(corpus)
    vocab = sorted({w for v in corpus.values() for w in v})
    dfreq = {w: sum(1 for v in corpus.values() if w in v) for w in vocab}
    vecs = {}
    for d, toks in corpus.items():
        wt = {
            w: toks.count(w) * (math.log((1 + n) / (1 + dfreq[w])) + 1)
            for w in set(toks)
        }
        nrm = math.sqrt(sum(x * x for x in wt.values()))
        vecs[d] = {w: x / nrm for w, x in wt.items()}
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sim = sum(
                vecs[a][w] * vecs[b].get(w, 0.0) for w in vecs[a]
            )
            if sim >= threshold:
                out[(a, b)] = sim
    return out


@pytest.fixture(scope="module")
def ap_df(spark):
    return spark.createDataFrame(AP_DOCS, ["doc_id", "text"])


@pytest.mark.parametrize("threshold", [0.3, 0.6, 0.9])
def test_allpairs_matches_bruteforce_replay(ap_df, threshold):
    from proxyfeatureextraction_spark.functions.retrieval import tfidf_allpairs

    exp = _py_allpairs(threshold)
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in tfidf_allpairs(ap_df, threshold=threshold).collect()
    }
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_allpairs_exact_dups_score_one(ap_df):
    from proxyfeatureextraction_spark.functions.retrieval import tfidf_allpairs

    got = {
        (r["a"], r["b"]): r["sim"]
        for r in tfidf_allpairs(ap_df, threshold=0.95).collect()
    }
    assert got[(0, 1)] == pytest.approx(1.0, abs=1e-9)
    # a < b canonical ordering, no self/backward pairs
    assert all(a < b for a, b in got)


def test_allpairs_rejects_bad_threshold(ap_df):
    from proxyfeatureextraction_spark.functions.retrieval import tfidf_allpairs

    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            tfidf_allpairs(ap_df, threshold=bad)


def test_allpairs_plan_shape(ap_df):
    from proxyfeatureextraction_spark.functions.retrieval import tfidf_allpairs

    qe = tfidf_allpairs(ap_df, threshold=0.6)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only window is the per-doc prefix cumsum — partitioned on
    # doc_id, never a corpus-wide funnel
    opt = qe.optimizedPlan().toString()
    for line in opt.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "doc_id" in line
    assert "CartesianProduct" not in plan


def test_allpairs_per_pair_verify_shape(ap_df):
    """r6 optimization pin: verification is one row per candidate pair
    (sorted entry array + map dot-product fold), not the exploded
    term-level join + groupBy(a, b) — no aggregate over the pair key
    remains in the plan."""
    import re

    from proxyfeatureextraction_spark.functions.retrieval import tfidf_allpairs

    qe = tfidf_allpairs(ap_df, threshold=0.6)._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    assert "map_from_entries" in opt
    plan = qe.executedPlan().toString()
    # the candidate distinct is still a keys=[a,b] aggregate; what must
    # be gone is the old dot-product aggregate sum(ua * ub) over the
    # exploded term rows
    assert not re.search(r"sum\(\(ua#\d+ \* ub#\d+\)\)", plan)
    assert "partial_sum" not in plan


def test_allpairs_string_fallback_exact(ap_df, monkeypatch):
    """When the term-hash injectivity check fails, the verify falls back
    to string-keyed maps with identical values. Forced here by patching
    the hash to a constant (every vocabulary collides)."""
    import pyspark.sql.functions as SF

    import proxyfeatureextraction_spark.functions.retrieval as R

    monkeypatch.setattr(R.F, "xxhash64", lambda c: SF.lit(1).cast("long"))
    exp = _py_allpairs(0.6)
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in R.tfidf_allpairs(ap_df, threshold=0.6).collect()
    }
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_bm25_query_filter_below_tf_aggregate(docs_df):
    # the (doc_id, term) tf aggregate must consume rows already
    # filtered to the query terms — the full-vocabulary exchange is
    # the difference between O(query) and O(corpus vocab) at scale
    opt = (
        bm25_search(docs_df, "quick dog", top_k=5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    aggs = [
        ln for ln in opt.splitlines() if "Aggregate [doc_id" in ln and ", w#" in ln
    ]
    assert aggs, opt
    assert " IN (" in opt, opt
    # children print BELOW their parents, so each tf aggregate (the
    # subtree appears twice: scoring + the pruned dfreq branch) must
    # have the query-term filter somewhere after it in the dump
    for a in aggs:
        assert opt.find(" IN (", opt.index(a)) != -1, a
