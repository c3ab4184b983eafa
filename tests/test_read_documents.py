"""JSONL/parquet/csv document ingestion for the LLM-pipeline operators."""

from __future__ import annotations

import gzip
import json

from proxyfeatureextraction_spark.sources.transcripts import read_documents

DOCS = [
    {"doc_id": 1, "text": "alpha beta gamma"},
    {"doc_id": 2, "text": "alpha beta gamma"},
    {"doc_id": 3, "text": "delta"},
]


def _rows(df):
    return {(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()}


def test_jsonl_by_extension(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS))
    assert _rows(read_documents(spark, str(p))) == {(d["doc_id"], d["text"]) for d in DOCS}


def test_jsonl_gzip(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(json.dumps(d) for d in DOCS))
    assert _rows(read_documents(spark, str(p))) == {(d["doc_id"], d["text"]) for d in DOCS}


def test_auto_chain_parquet_then_jsonl(spark, tmp_path):
    pq = tmp_path / "pq_dir"
    spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in DOCS], "doc_id long, text string"
    ).write.parquet(str(pq))
    assert _rows(read_documents(spark, str(pq))) == {(d["doc_id"], d["text"]) for d in DOCS}
    # a dir of .json files with no extension hint on the DIR itself:
    # parquet fails, json succeeds
    jd = tmp_path / "json_dir"
    jd.mkdir()
    (jd / "part-0.json").write_text("\n".join(json.dumps(d) for d in DOCS))
    assert _rows(read_documents(spark, str(jd))) == {(d["doc_id"], d["text"]) for d in DOCS}


def test_explicit_csv(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("doc_id,text\n1,alpha\n2,beta\n")
    got = _rows(read_documents(spark, str(p), fmt="csv"))
    assert got == {(1, "alpha"), (2, "beta")}


def test_jsonl_feeds_dedup(spark, tmp_path):
    """End-to-end: a jsonl corpus drives the dedup operators directly."""
    from proxyfeatureextraction_spark.operators.dedup import exact_dedup

    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in DOCS))
    groups = exact_dedup(read_documents(spark, str(p)))
    stats = {(r.keep_id, r.copies) for r in groups.collect()}
    assert stats == {(1, 2), (3, 1)}
