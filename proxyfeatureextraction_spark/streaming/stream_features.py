"""Structured Streaming counterparts of the batch windowed operators.

The reference is pure batch (SURVEY §2.9); these give its three
streaming-shaped constructs watermark-correct streaming semantics:

- tumbling per-(conv, window) aggregates (the 0.1 s-bin analog),
- gap-based session windows (``session_window``),
- a stateful per-conversation running profile via
  ``applyInPandasWithState`` (custom stateful operator surface).

Batch/stream parity: the same aggregations run identically on a static
DataFrame — tests drive both from the same parquet and compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S


def stream_transcripts(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(S.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def _derived(stream: DataFrame) -> DataFrame:
    # shared with the batch path (schema.with_basic_derived) so the
    # direction / n_chars rules cannot drift between batch and stream
    return S.with_basic_derived(stream)


def tumbling_turn_stats(
    stream: DataFrame, window: str = "1 minute", watermark: str = "10 minutes"
) -> DataFrame:
    """A3/A4 streaming analog: per-(conv, tumbling-window) turn stats."""
    return (
        _derived(stream)
        .withWatermark(S.TS, watermark)
        .groupBy(S.CONV, F.window(S.TS, window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(S.N_CHARS).alias("sum_chars"),
            F.sum(F.when(F.col(S.DIR) == 1, 1).otherwise(0)).alias("n_user"),
        )
    )


def sliding_turn_stats(
    stream: DataFrame,
    window: str = "1 minute",
    slide: str = "30 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window per-conv turn stats: each row lands in
    window/slide overlapping windows (rate smoothing / burst detection —
    the hopping-window face of ``tumbling_turn_stats``)."""
    return (
        _derived(stream)
        .withWatermark(S.TS, watermark)
        .groupBy(S.CONV, F.window(S.TS, window, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(S.N_CHARS).alias("sum_chars"),
        )
    )


def session_stats(
    stream: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """W8 streaming analog: gap-based session windows per conversation."""
    return (
        _derived(stream)
        .withWatermark(S.TS, watermark)
        .groupBy(S.CONV, F.session_window(S.TS, gap).alias("session"))
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum(S.N_CHARS).alias("sum_chars"))
    )


def stream_dedup_exact(
    stream: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = S.TS,
    text_col: str = S.TEXT,
) -> DataFrame:
    """Streaming exact dedup: the FIRST arrival of each content survives;
    later copies arriving within the watermark window are dropped.

    Keys on sha2-256 of the text (exact up to a 2^-128 collision, state
    rows stay hash-sized instead of document-sized) and uses
    ``dropDuplicatesWithinWatermark`` so state is EVICTED once the key
    ages past the watermark — the unbounded-state hazard of plain
    ``dropDuplicates`` on an infinite stream is the whole reason this
    operator exists. Copies that arrive later than the watermark after
    their original are re-emitted (the documented trade: state bound vs
    cross-epoch dedup — run the batch ``exact_dedup`` over the sink for
    the global pass)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("_content", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
        .dropDuplicatesWithinWatermark(["_content"])
        .drop("_content")
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a streaming query to completion against static files
    (local smoke harness): memory sink + processAllAvailable.
    ``mode="append"`` for row-emitting operators (dedup, map-only)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def stateful_conv_profile(stream: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator: running per-conversation profile
    (turn count, char sum, last ts) maintained across micro-batches via
    applyInPandasWithState."""
    import pandas as pd

    out_schema = "conv_id string, n_turns long, sum_chars long, last_ts timestamp"
    state_schema = "n long, s long, last timestamp"

    def update(key, pdfs, state):
        n, sm, last = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            n += len(pdf)
            sm += int(pdf[S.N_CHARS].sum())
            mx = pdf[S.TS].max()
            last = mx if last is None or mx > last else last
        state.update((n, sm, last))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_turns": [n], "sum_chars": [sm], "last_ts": [last]}
        )

    return (
        _derived(stream)
        .groupBy(S.CONV)
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def stream_curate_docs(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    min_quality: float = 0.0,
    min_words_per_line: int = 1,
    watermark: str = "30 minutes",
    keep_cols: tuple[str, ...] = (),
    corpus_sigs: DataFrame | None = None,
    corpus_n_perm: int = 16,
    corpus_bands: int = 8,
    corpus_shingle: int | None = None,
) -> DataFrame:
    """Ingest-time curation as ONE streaming pipeline: C4 line
    cleaning → quality scoring → corpus near-dup guard (optional) →
    bounded-state exact dedup — the stateless curation layer plus the
    only stateful step that is safe on an infinite stream.

    Stages (all batch-parity-tested against their batch twins):

    1. ``clean_lines`` strips boilerplate lines per document (pure
       per-row HOFs — trivially streaming-safe);
    2. documents failing the keep flag or scoring below
       ``min_quality`` are dropped (stateless filter);
    3. when ``corpus_sigs`` is given — a persisted
       ``band_signature_store`` snapshot read back as a static frame —
       documents whose CLEANED text is an exact (digest) or near (LSH
       band-collision) duplicate of the existing corpus are dropped via
       ``dedup.flag_corpus_dups``: per-row HOF minhash signatures plus
       stream-STATIC equi-joins, so the stage is stateless (no extra
       watermark, rows emit immediately) and its per-batch cost scales
       with ingest rate, not corpus size.  Build the store over the
       SAME cleaning parameters so digests line up.  Candidacy is the
       band rule without an exact-Jaccard verify (the stream has no
       corpus text to verify against) — run batch
       ``dedup_incremental`` over the sink for the verified global
       pass;
    4. first-arrival-wins exact dedup keyed on the sha2-256 digest of
       the CLEANED text, with state evicted past ``watermark``
       (``dropDuplicatesWithinWatermark`` — same trade as
       ``stream_dedup_exact``: bounded state vs cross-epoch dedup).

    ``ts_col`` is the event-time column the watermark rides on (an
    ingest timestamp column in the source; there is deliberately no
    ``current_timestamp()`` fallback — processing-time watermarks make
    re-runs nondeterministic). ``keep_cols`` names source columns to
    carry through unchanged (lang, source, …) so the sink keeps what
    the batch follow-up passes (mixture resampling, DSIR, per-source
    reports) need. Emits the cleaned text plus ``quality_score`` and
    the line-cleaning counters, in append mode.
    """
    from proxyfeatureextraction_spark.functions.text import quality_score
    from proxyfeatureextraction_spark.operators.curation import clean_lines
    from proxyfeatureextraction_spark.operators.dedup import flag_corpus_dups

    cleaned = clean_lines(
        stream.select(
            F.col("doc_id"),
            F.col(text_col).alias("text"),
            F.col(ts_col).alias("_ts"),
            *[F.col(c) for c in keep_cols],
        ),
        min_words_per_line=min_words_per_line,
        id_col="doc_id",
        keep_cols=("_ts", *keep_cols),
    )
    scored = cleaned.withColumn("quality_score", quality_score("text")).filter(
        F.col("keep") & (F.col("quality_score") >= min_quality)
    )
    if corpus_sigs is not None:
        scored = (
            flag_corpus_dups(
                scored,
                corpus_sigs,
                n_perm=corpus_n_perm,
                bands=corpus_bands,
                shingle=corpus_shingle,
                text_col="text",
                flag_col="_corpus_dup",
            )
            .filter(~F.col("_corpus_dup"))
            .drop("_corpus_dup")
        )
    # the bounded-state dedup tail is stream_dedup_exact itself (one
    # recipe, parameterized — not a second inline copy to diverge)
    return stream_dedup_exact(
        scored, watermark=watermark, ts_col="_ts", text_col="text"
    ).withColumnRenamed("_ts", ts_col)


def stream_psi_drift(
    stream: DataFrame,
    ref: DataFrame,
    col: str,
    ts_col: str,
    n_buckets: int = 10,
    window: str = "10 minutes",
    watermark: str | None = None,
    bounds: tuple[float, float] | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Streaming drift alarm: Population Stability Index of ``col``
    against a static reference distribution, one row per event-time
    window — the ingest-time twin of batch ``curation.psi_drift``
    (same buckets, same eps-smoothed p·ln formula), so a pipeline can
    page on a drifting corpus drop BEFORE the nightly batch report.

    Streaming-safety shape: everything reference-sided happens ONCE at
    plan-build time on the static frame (bucket bounds from exact
    min/max, per-bucket fractions collected — ≤ ``n_buckets`` tiny
    rows) and enters the plan as literals; the stream side is ONE
    windowed aggregation whose state is a single row of ``n_buckets``
    counters per open window (the per-bucket counts are pivoted into
    columns of one agg — NOT a second aggregation over a streaming
    aggregate, which Spark rejects, and not a stream-static join after
    the agg, which append mode restricts).  PSI is then pure column
    arithmetic on the closed window's row.  Works identically on a
    static frame (the parity tests drive both from the same parquet).

    With ``watermark`` set, append-mode sinks emit each window's PSI
    once the watermark passes it; state is dropped, so an infinite
    stream holds O(open windows × n_buckets) counters.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    v = F.col(col).cast("double")
    if bounds is None:
        lo, hi = ref.select(F.min(v), F.max(v)).first()
        if lo is None:
            raise ValueError(f"{col} has no non-null values in ref")
    else:
        lo, hi = float(bounds[0]), float(bounds[1])
    width = (hi - lo) / n_buckets or 1.0
    b_expr = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    rc = {
        r["b"]: r["n"]
        for r in ref.where(v.isNotNull())
        .groupBy(b_expr.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tot_ref = sum(rc.values())
    p_ref = [max(rc.get(i, 0) / tot_ref, eps) for i in range(n_buckets)]

    src = stream
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    agg = (
        src.where(v.isNotNull())
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            *[
                F.sum(F.when(b_expr == i, 1).otherwise(0)).alias(f"_c{i}")
                for i in range(n_buckets)
            ]
        )
    )
    total = sum(F.col(f"_c{i}") for i in range(n_buckets))
    psi = F.lit(0.0)
    for i in range(n_buckets):
        p_cur = F.greatest(F.col(f"_c{i}") / total, F.lit(eps))
        psi = psi + (p_cur - F.lit(p_ref[i])) * F.log(p_cur / F.lit(p_ref[i]))
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        total.cast("long").alias("n_cur"),
        F.round(psi, 6).alias("psi"),
    )
