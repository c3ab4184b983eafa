"""Property tests for the round-4 curation operators
(hypothesis; few examples — each drives a full Spark job)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


@st.composite
def corpora(draw, max_docs=8, max_words=40):
    n_docs = draw(st.integers(1, max_docs))
    docs = []
    for i in range(n_docs):
        nw = draw(st.integers(0, max_words))
        idx = draw(st.lists(st.integers(0, len(WORDS) - 1), min_size=nw, max_size=nw))
        docs.append((i, " ".join(WORDS[j] for j in idx)))
    return docs


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpora(), max_words=st.integers(1, 12), extra=st.integers(0, 11))
def test_chunk_docs_covers_every_word_exactly(spark, docs, max_words, extra):
    """Disjoint chunking (stride == max_words) is a partition of each
    doc's words; overlapping chunking covers every word at least once
    and starts every chunk exactly stride words after the previous."""
    from proxyfeatureextraction_spark.operators.curation import chunk_docs

    stride = min(max_words, 1 + extra)  # 1 <= stride <= max_words
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_docs(df, max_words=max_words, stride=stride).collect()
    words_by_doc = {i: [w for w in t.split(" ") if w] for i, t in docs}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, words in words_by_doc.items():
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_id"])
        if not words:
            assert got == []
            continue
        # chunk k reproduces words[k*stride : k*stride + max_words]
        for r in got:
            lo = r["chunk_id"] * stride
            expect = words[lo : lo + max_words]
            assert r["text"].split(" ") == expect
            assert r["n_words"] == len(expect)
        # full coverage: the last chunk reaches the final word
        last = got[-1]
        assert last["chunk_id"] * stride + last["n_words"] == len(words)
        # minimality: one fewer chunk would leave a tail uncovered
        if len(got) > 1:
            prev = got[-2]
            assert prev["chunk_id"] * stride + max_words < len(words)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpora(max_docs=6, max_words=30), nl=st.integers(2, 5))
def test_dedup_lines_multiset_invariant(spark, docs, nl):
    """Corpus-wide line dedup keeps EXACTLY one copy of every distinct
    line, and each survivor doc is a subsequence of its original."""
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.operators.curation import dedup_lines

    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){%d}\S+) " % (nl - 1), "$1\n"),
    )
    src = {r["doc_id"]: r["text"] for r in df.collect()}
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    all_lines = {l for t in src.values() for l in t.split("\n") if l}
    kept = [l for r in got.values() if r["text"] for l in r["text"].split("\n")]
    assert sorted(kept) == sorted(all_lines)  # one copy each, none lost
    for doc_id, text in src.items():
        orig = [l for l in text.split("\n") if l]
        surv = got[doc_id]["text"].split("\n") if got[doc_id]["text"] else []
        it = iter(orig)
        assert all(s in it for s in surv)  # subsequence order preserved
        assert got[doc_id]["n_lines"] == len(orig)
        assert got[doc_id]["n_lines_kept"] == len(surv)
