"""Resume semantics: a partial run's completed partitions are skipped
and the final output is identical to a single clean run (SURVEY §5.6)."""

from __future__ import annotations

import json
import os

import pandas as pd

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.plans.extract import extract_features
from proxyfeatureextraction_spark.schema import with_derived
from proxyfeatureextraction_spark.sources.checkpoint import (
    completed_partitions,
    run_resumable,
)


def _builder(raw):
    d = with_derived(raw)
    feats = extract_features(d)
    folders = d.select(S.FOLDER, S.CONV).distinct()
    return feats.drop(S.FOLDER).join(folders, S.CONV, "left")


def test_resume_skips_completed(spark, transcripts_df, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    transcripts_df.write.mode("overwrite").parquet(src)

    # full clean run
    s1 = run_resumable(spark, src, out, _builder)
    assert s1["processed"] > 0 and s1["skipped"] == 0
    done = completed_partitions(out)
    assert done

    # re-run: everything skipped, output unchanged
    before = spark.read.parquet(out).toPandas().sort_values(S.CONV).reset_index(drop=True)
    s2 = run_resumable(spark, src, out, _builder)
    assert s2["processed"] == 0 and s2["skipped"] == len(done)
    after = spark.read.parquet(out).toPandas().sort_values(S.CONV).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_partial_failure_resume(spark, transcripts_df, tmp_path):
    import shutil

    src = str(tmp_path / "src")
    out_clean = str(tmp_path / "clean")
    out_resumed = str(tmp_path / "resumed")
    transcripts_df.write.mode("overwrite").parquet(src)

    run_resumable(spark, src, out_clean, _builder)

    # simulate a killed run on the SAME input: complete everything, then
    # strip all manifests + data except folder_0's (as if the job died
    # after the first partition's manifest landed)
    run_resumable(spark, src, out_resumed, _builder)
    for name in completed_partitions(out_resumed) - {"folder_0"}:
        os.remove(os.path.join(out_resumed, "_manifests", f"{name}.json"))
        shutil.rmtree(os.path.join(out_resumed, f"{S.FOLDER}={name}"), ignore_errors=True)
    assert completed_partitions(out_resumed) == {"folder_0"}

    s = run_resumable(spark, src, out_resumed, _builder)
    assert s["skipped"] == 1 and s["processed"] >= 1

    a = spark.read.parquet(out_clean).toPandas().sort_values(S.CONV).reset_index(drop=True)
    b = spark.read.parquet(out_resumed).toPandas().sort_values(S.CONV).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_like=True
    )

    # manifests carry lineage fields
    mpath = os.path.join(out_resumed, "_manifests", "folder_0.json")
    m = json.load(open(mpath))
    assert m["rows"] >= 0 and "input_fingerprint" in m and m["wall_sec"] > 0


def test_stale_manifest_reextracted(spark, transcripts_df, tmp_path):
    """A manifest written against a different input fingerprint must not
    count as completed: resuming after the input dataset changed
    re-extracts the partition instead of keeping stale features."""
    from pyspark.sql import functions as F

    src_old = str(tmp_path / "src_old")
    src_new = str(tmp_path / "src_new")
    out = str(tmp_path / "out")
    transcripts_df.filter(F.col(S.FOLDER) == "folder_0").write.mode("overwrite").parquet(src_old)
    transcripts_df.write.mode("overwrite").parquet(src_new)

    run_resumable(spark, src_old, out, _builder)
    assert completed_partitions(out) == {"folder_0"}

    s = run_resumable(spark, src_new, out, _builder)
    # folder_0's manifest is stale (different input fingerprint) → re-extracted
    assert s["skipped"] == 0 and s["stale"] == 1
    assert s["processed"] == len(completed_partitions(out))
    m = json.load(open(os.path.join(out, "_manifests", "folder_0.json")))
    assert m["input_fingerprint"] == s["fingerprint"]


def test_fingerprint_sees_partitioned_subdir_rewrites(spark, transcripts_df, tmp_path):
    """Review regression: a PARTITIONED input (data files in
    subdirectories) rewritten in place must change the fingerprint —
    the old top-level listdir hashed only the unchanging partition
    directory names."""
    from proxyfeatureextraction_spark.sources.checkpoint import input_fingerprint

    src = str(tmp_path / "psrc")
    transcripts_df.write.mode("overwrite").partitionBy(S.FOLDER).parquet(src)
    fp1 = input_fingerprint(spark, src)
    # same-shape rewrite of one partition (different rows)
    transcripts_df.filter(f"{S.TURN} % 2 = 0").write.mode("overwrite").partitionBy(
        S.FOLDER
    ).parquet(src)
    fp2 = input_fingerprint(spark, src)
    assert fp1 != fp2


def test_zero_row_rebuild_clears_stale_partition(spark, transcripts_df, tmp_path):
    """Review regression: when a stale partition's rebuild yields zero
    rows, its old parquet files must not survive the dynamic overwrite
    and be re-manifested as fresh."""
    from pyspark.sql import functions as F

    from proxyfeatureextraction_spark.sources.checkpoint import run_resumable

    src = str(tmp_path / "zsrc")
    out = str(tmp_path / "zout")
    transcripts_df.write.mode("overwrite").parquet(src)
    run_resumable(spark, src, out, _builder)
    parts = [
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith(f"{S.FOLDER}=")
    ]
    victim = sorted(parts)[0]

    # input change: the victim partition disappears from the source
    transcripts_df.filter(F.col(S.FOLDER) != victim).write.mode(
        "overwrite"
    ).parquet(src)

    def empty_builder(raw):
        return _builder(raw).limit(0)

    # a builder returning zero rows for everything: stale partitions
    # must end up with zero manifested rows, not their old data
    run_resumable(spark, src, out, empty_builder)
    mdir = os.path.join(out, "_manifests")
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as fh:
            m = json.load(fh)
        if m["partition"] != victim:
            assert m["rows"] == 0, f"stale data re-manifested for {m['partition']}"


def test_remote_branch_fingerprint_sees_inplace_rewrite(spark, tmp_path):
    """Advisor finding: the non-directory branch (remote stores resolve
    here) used to hash only file NAMES, so a same-name in-place rewrite
    kept the old fingerprint and run_resumable would skip re-processing.
    It now hashes name + length + modification time via the Hadoop
    FileSystem, so the rewrite is seen. A single local parquet FILE
    exercises exactly that branch (it is not a directory)."""
    import time

    import pandas as pd

    from proxyfeatureextraction_spark.sources.checkpoint import input_fingerprint

    p = str(tmp_path / "single.parquet")
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(p)
    fp1 = input_fingerprint(spark, p)
    assert fp1.startswith("files:")
    time.sleep(0.02)  # Hadoop mtime resolution is 1 ms
    pd.DataFrame({"a": [4, 5, 6]}).to_parquet(p)  # same name, same shape
    fp2 = input_fingerprint(spark, p)
    assert fp1 != fp2
    # stable when nothing changed
    assert input_fingerprint(spark, p) == fp2
