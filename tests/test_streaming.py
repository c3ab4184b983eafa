"""Streaming/batch parity: the same windowed aggregations produce the
same results whether driven by readStream (memory sink) or batch."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.streaming.stream_features import (
    run_to_memory,
    session_stats,
    stateful_conv_profile,
    stream_transcripts,
    tumbling_turn_stats,
)


def _src(spark, transcripts_df, tmp_path):
    path = str(tmp_path / "stream_src")
    transcripts_df.write.mode("overwrite").parquet(path)
    return path


def test_tumbling_stream_matches_batch(spark, transcripts_df, tmp_path):
    path = _src(spark, transcripts_df, tmp_path)
    run_to_memory(tumbling_turn_stats(stream_transcripts(spark, path, max_files=4)), "tumb")
    got = (
        spark.table("tumb")
        .select(S.CONV, F.col("win.start").alias("ws"), "n_turns", "sum_chars", "n_user")
        .toPandas()
        .sort_values([S.CONV, "ws"])
        .reset_index(drop=True)
    )
    batch = spark.read.parquet(path)
    exp = (
        batch.withColumn(S.N_CHARS, F.coalesce(F.length(S.TEXT), F.lit(0)))
        .withColumn(S.DIR, F.when(F.col(S.ROLE) == "user", 1).otherwise(-1))
        .groupBy(S.CONV, F.window(S.TS, "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(S.N_CHARS).alias("sum_chars"),
            F.sum(F.when(F.col(S.DIR) == 1, 1).otherwise(0)).alias("n_user"),
        )
        .select(S.CONV, F.col("win.start").alias("ws"), "n_turns", "sum_chars", "n_user")
        .toPandas()
        .sort_values([S.CONV, "ws"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_session_window_stream(spark, transcripts_df, tmp_path):
    path = _src(spark, transcripts_df, tmp_path)
    run_to_memory(session_stats(stream_transcripts(spark, path)), "sess")
    got = spark.table("sess").toPandas()
    assert len(got) > 0
    # sessions per conv ≥ 1 and turn counts add up
    per_conv = got.groupby(S.CONV)["n_turns"].sum()
    exp = transcripts_df.groupBy(S.CONV).count().toPandas().set_index(S.CONV)["count"]
    assert per_conv.sort_index().tolist() == exp.sort_index().tolist()


def test_stateful_profile(spark, transcripts_df, tmp_path):
    path = _src(spark, transcripts_df, tmp_path)
    out = stateful_conv_profile(stream_transcripts(spark, path, max_files=2))
    q = out.writeStream.outputMode("update").format("memory").queryName("prof").start()
    q.processAllAvailable()
    q.stop()
    got = (
        spark.table("prof")
        .groupBy("conv_id")
        .agg(F.max("n_turns").alias("n_turns"), F.max("sum_chars").alias("sum_chars"))
        .toPandas()
        .set_index("conv_id")
    )
    exp = (
        transcripts_df.withColumn("nc", F.length(S.TEXT))
        .groupBy(S.CONV)
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum("nc").alias("sum_chars"))
        .toPandas()
        .set_index(S.CONV)
    )
    assert got["n_turns"].sort_index().tolist() == exp["n_turns"].sort_index().tolist()
    assert got["sum_chars"].sort_index().tolist() == exp["sum_chars"].sort_index().tolist()


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark discipline (§2.9): in update mode, state for windows
    older than the watermark is evicted and late rows for them are
    DROPPED — the streaming face of the zero-temporal-leakage rule."""
    import pandas as pd

    src = str(tmp_path / "late_src")
    t = lambda s: pd.Timestamp(f"2026-01-01 {s}").to_pydatetime()  # noqa: E731
    batch1 = spark.createDataFrame(
        [
            ("f1", "relayed", "a", 0, "user", "hello", None, t("10:00:10")),
            ("f1", "relayed", "a", 1, "assistant", "hi", None, t("10:00:20")),
            ("f1", "relayed", "a", 2, "user", "much later", None, t("11:00:00")),
        ],
        S.TRANSCRIPT_SCHEMA,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    q = (
        tumbling_turn_stats(
            stream_transcripts(spark, src, max_files=10),
            window="1 minute",
            watermark="10 minutes",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("late_tbl")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is now 11:00 − 10 min = 10:50 > the 10:00 window end;
        # this row is LATE and must be dropped, not aggregated
        late = spark.createDataFrame(
            [("f1", "relayed", "a", 3, "user", "too late", None, t("10:00:40"))],
            S.TRANSCRIPT_SCHEMA,
        )
        late.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("late_tbl")
        .select(F.col("win.start").alias("ws"), "n_turns")
        .toPandas()
    )
    first_win = got[got["ws"] == pd.Timestamp("2026-01-01 10:00:00")]
    # exactly one emission for the 10:00 window, WITHOUT the late row
    assert len(first_win) == 1 and first_win["n_turns"].iloc[0] == 2


def test_stream_dedup_exact_matches_batch_distinct(spark, transcripts_df, tmp_path):
    """Streaming exact dedup (bounded state via
    dropDuplicatesWithinWatermark): one survivor per distinct content
    across micro-batches; the surviving TEXT set equals batch distinct."""
    from proxyfeatureextraction_spark.streaming.stream_features import (
        stream_dedup_exact,
    )

    path = _src(spark, transcripts_df, tmp_path)
    run_to_memory(
        stream_dedup_exact(
            stream_transcripts(spark, path, max_files=2), watermark="365 days"
        ),
        "sdedup",
        mode="append",
    )
    got = spark.table("sdedup").toPandas()
    exp_texts = {
        r.t for r in spark.read.parquet(path)
        .select(F.coalesce(F.col(S.TEXT), F.lit("")).alias("t")).distinct().collect()
    }
    assert len(got) == len(exp_texts)
    assert {("" if t is None else t) for t in got[S.TEXT]} == exp_texts


def test_stream_dedup_drops_cross_batch_copies(spark, tmp_path):
    """Copies arriving in LATER micro-batches (within the watermark) are
    dropped; a genuinely new text still passes."""
    import pandas as pd

    src = str(tmp_path / "dd_src")
    t = lambda s: pd.Timestamp(f"2026-01-01 {s}").to_pydatetime()  # noqa: E731
    b1 = spark.createDataFrame(
        [
            ("f1", "relayed", "a", 0, "user", "same text", None, t("10:00:10")),
            ("f1", "relayed", "a", 1, "assistant", "other", None, t("10:00:20")),
        ],
        S.TRANSCRIPT_SCHEMA,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    from proxyfeatureextraction_spark.streaming.stream_features import (
        stream_dedup_exact,
    )

    q = (
        stream_dedup_exact(
            stream_transcripts(spark, src, max_files=10), watermark="1 hour"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_tbl")
        .start()
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [
                ("f2", "relayed", "b", 0, "user", "same text", None, t("10:05:00")),
                ("f2", "relayed", "b", 1, "user", "brand new", None, t("10:05:10")),
            ],
            S.TRANSCRIPT_SCHEMA,
        )
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("dd_tbl").toPandas()
    assert sorted(got[S.TEXT]) == ["brand new", "other", "same text"]


def test_sliding_stream_matches_batch(spark, transcripts_df, tmp_path):
    """Hopping windows: streaming result equals the same sliding-window
    aggregation run in batch (each row in window/slide windows)."""
    from proxyfeatureextraction_spark.streaming.stream_features import (
        sliding_turn_stats,
    )

    path = _src(spark, transcripts_df, tmp_path)
    run_to_memory(
        sliding_turn_stats(stream_transcripts(spark, path, max_files=4)), "slide"
    )
    got = (
        spark.table("slide")
        .select(S.CONV, F.col("win.start").alias("ws"), "n_turns", "sum_chars")
        .toPandas()
        .sort_values([S.CONV, "ws"])
        .reset_index(drop=True)
    )
    exp = (
        spark.read.parquet(path)
        .withColumn(S.N_CHARS, F.coalesce(F.length(S.TEXT), F.lit(0)))
        .groupBy(S.CONV, F.window(S.TS, "1 minute", "30 seconds").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum(S.N_CHARS).alias("sum_chars"))
        .select(S.CONV, F.col("win.start").alias("ws"), "n_turns", "sum_chars")
        .toPandas()
        .sort_values([S.CONV, "ws"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # overlap sanity: sliding emits ~2x the tumbling window count
    assert len(got) > spark.read.parquet(path).select(S.CONV).distinct().count()


def test_stream_curate_docs_end_to_end(spark, tmp_path):
    """Ingest-time curation stream: line cleaning and quality filter
    are batch-identical per row; exact dup (after cleaning) keeps one
    arrival; empty docs drop via the keep flag."""
    import datetime as dt

    from proxyfeatureextraction_spark.streaming.stream_features import (
        run_to_memory,
        stream_curate_docs,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "good line with words here\nno", t0, "en"),
        (2, "good line with words here\nno", t0 + dt.timedelta(minutes=1), "en"),
        (3, "a different decent content line", t0, "de"),
        (4, "", t0, "en"),
    ]
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp, lang string"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp, lang string"
    ).parquet(src)
    out = stream_curate_docs(stream, min_words_per_line=3, keep_cols=("lang",))
    run_to_memory(out, "curate_stream", mode="append")
    got = {r["doc_id"]: r.asDict() for r in spark.table("curate_stream").collect()}
    # docs 1 and 2 clean to the same text -> exactly one survives
    assert len(set(got) & {1, 2}) == 1
    assert 3 in got and 4 not in got
    surv = got[1] if 1 in got else got[2]
    # the short "no" line was stripped by the 3-word rule
    assert surv["text"] == "good line with words here"
    assert surv["n_lines_in"] == 2 and surv["n_lines_kept"] == 1
    assert "quality_score" in surv and "ingest_ts" in surv
    # passthrough column survives to the sink
    assert surv["lang"] == "en" and got[3]["lang"] == "de"


def test_stream_curate_job_resumes_from_checkpoint(spark, tmp_path):
    """The CLI streaming job: availableNow run over a landing dir, then
    a SECOND run after more files land — the checkpoint must make it
    process only the new data (no duplicate output rows)."""
    import datetime as dt

    from proxyfeatureextraction_spark.jobs.stream_curate import main

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    land = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ingest_ts timestamp"
    spark.createDataFrame(
        [(1, "first decent document line here", t0)], schema
    ).write.mode("append").parquet(land)
    args = ["--input", land, "--output", out, "--checkpoint", ckpt,
            "--schema", schema, "--available-now"]
    main(args)
    assert spark.read.parquet(out).count() == 1
    spark.createDataFrame(
        [(2, "second decent document line here", t0 + dt.timedelta(minutes=2))],
        schema,
    ).write.mode("append").parquet(land)
    main(args)
    pdf = spark.read.parquet(out).toPandas()
    assert sorted(pdf["doc_id"]) == [1, 2]  # no reprocessing of doc 1


def test_stream_curate_near_dup_guard(spark, tmp_path):
    """stream_curate_docs(corpus_sigs=...): a doc landing within the
    watermark that exactly or NEARLY duplicates the persisted corpus
    (shares LSH band signatures from a band_signature_store snapshot)
    is dropped by a stateless stream-static join; fresh docs pass.
    Batch parity: flag_corpus_dups on the same static input keeps the
    same survivors."""
    import datetime as dt

    from proxyfeatureextraction_spark.operators.dedup import (
        band_signature_store,
        flag_corpus_dups,
    )
    from proxyfeatureextraction_spark.streaming.stream_features import (
        run_to_memory,
        stream_curate_docs,
    )

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "corpus document about distributed query engines")],
        "doc_id long, text string",
    )
    store_path = str(tmp_path / "sig_store")
    band_signature_store(corpus, n_perm=16, bands=8).write.mode(
        "overwrite"
    ).parquet(store_path)
    store = spark.read.parquet(store_path)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", t0),       # exact corpus dup
        (2, "dog lazy the over jumps fox brown quick the", t0),       # near-dup (permuted)
        (3, "a genuinely new document with novel words inside", t0),  # fresh
        (4, "a genuinely new document with novel words inside",
         t0 + dt.timedelta(minutes=1)),                               # in-stream exact dup
    ]
    src = str(tmp_path / "near_dup_stream")
    schema = "doc_id long, text string, ingest_ts timestamp"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_curate_docs(stream, corpus_sigs=store)
    run_to_memory(out, "near_dup_curate", mode="append")
    got = sorted(r["doc_id"] for r in spark.table("near_dup_curate").collect())
    assert got == [3] or got == [4]  # corpus dups dropped; one fresh survivor

    # batch parity on the corpus-guard stage itself
    static = spark.createDataFrame(rows, schema)
    kept = sorted(
        r["doc_id"]
        for r in flag_corpus_dups(static, store, n_perm=16, bands=8)
        .filter("NOT corpus_dup")
        .collect()
    )
    assert kept == [3, 4]


def test_stream_psi_drift_matches_batch_and_alarms(spark, tmp_path):
    """Windowed streaming PSI vs the batch twin on the same parquet:
    window 1 replays the reference distribution (psi ~ 0), window 2 is
    shifted (psi over the 0.25 alarm threshold); stream results equal
    running the same function on the static frame."""
    import datetime as dt

    from proxyfeatureextraction_spark.streaming.stream_features import (
        run_to_memory,
        stream_psi_drift,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(minute, values):
        return [
            (t0 + dt.timedelta(minutes=minute, seconds=i % 60), float(v))
            for i, v in enumerate(values)
        ]

    ref_vals = [i % 10 for i in range(200)]
    cur1 = rows(0, [i % 10 for i in range(100)])      # same shape
    cur2 = rows(10, [9.0] * 100)                       # mass at top edge
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "v double")
    data = spark.createDataFrame(cur1 + cur2, "ts timestamp, v double")
    path = str(tmp_path / "psi_src")
    data.repartition(2).write.parquet(path)

    static = spark.read.parquet(path)
    batch = {
        r["window_start"]: (r["n_cur"], r["psi"])
        for r in stream_psi_drift(
            static, ref, "v", "ts", n_buckets=5, window="10 minutes"
        ).collect()
    }
    assert len(batch) == 2
    (w1, w2) = sorted(batch)
    assert batch[w1][0] == 100 and batch[w2][0] == 100
    assert abs(batch[w1][1]) < 0.01          # same distribution
    assert batch[w2][1] > 0.25               # shifted: alarm zone

    stream = spark.readStream.schema("ts timestamp, v double").parquet(path)
    run_to_memory(
        stream_psi_drift(
            stream, ref, "v", "ts", n_buckets=5, window="10 minutes",
            watermark="1 minute",
        ),
        "psi_stream",
    )
    got = {
        r["window_start"]: (r["n_cur"], r["psi"])
        for r in spark.sql("select * from psi_stream").collect()
    }
    assert got == batch


def test_stream_psi_drift_matches_batch_psi_operator(spark):
    """The summed per-bucket psi from curation.psi_drift equals the
    single-window stream_psi_drift figure on identical inputs (same
    buckets, same eps) — the two surfaces must not drift apart."""
    import datetime as dt

    from proxyfeatureextraction_spark.operators.curation import psi_drift
    from proxyfeatureextraction_spark.streaming.stream_features import (
        stream_psi_drift,
    )

    ref = spark.createDataFrame(
        [(float(i % 7),) for i in range(140)], "v double"
    )
    cur_vals = [float((i * 3) % 9) for i in range(90)]
    cur = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    batch_total = sum(
        r["psi"] for r in psi_drift(ref, cur, "v", n_buckets=7).collect()
    )
    t0 = dt.datetime(2024, 1, 1)
    timed = spark.createDataFrame(
        [(t0, v) for v in cur_vals], "ts timestamp, v double"
    )
    got = stream_psi_drift(
        timed, ref, "v", "ts", n_buckets=7, window="60 minutes"
    ).collect()
    assert len(got) == 1
    # batch rounds per-bucket then sums; stream sums then rounds — the
    # residue is bounded by n_buckets x 5e-7
    assert abs(got[0]["psi"] - batch_total) < 5e-6


def test_stream_psi_drift_errors(spark):
    from proxyfeatureextraction_spark.streaming.stream_features import (
        stream_psi_drift,
    )

    ref = spark.createDataFrame([(1.0,)], "v double")
    df = spark.createDataFrame([], "ts timestamp, v double")
    with pytest.raises(ValueError):
        stream_psi_drift(df, ref, "v", "ts", n_buckets=0)
    empty_ref = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError):
        stream_psi_drift(df, empty_ref, "v", "ts")
