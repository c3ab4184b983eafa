"""spark-submit entry: streaming ingest curation → parquet sink.

The streaming twin of ``jobs/curate.py``: continuously clean, score and
dedup documents as they land, writing survivors to a parquet sink with
exactly-once file-sink semantics (checkpointed offsets + sink log).
Batch re-curation (global dedup, decontamination, splits) still runs
over the sink with ``jobs/curate.py`` — the stream handles the
ingest-time, bounded-state subset.

Usage:
    spark-submit --py-files pfx.zip \\
        proxyfeatureextraction_spark/jobs/stream_curate.py \\
        --input <landing dir> --output <curated dir> \\
        --checkpoint <checkpoint dir> [--ts-col ingest_ts] \\
        [--min-quality 0.0] [--min-line-words 1] \\
        [--watermark "30 minutes"] [--available-now]

``--available-now`` processes everything currently in the landing dir
and exits (bounded backfill / cron mode); without it the query runs
until stopped (true streaming mode).
"""

from __future__ import annotations

import argparse

from proxyfeatureextraction_spark.session import get_spark

DOC_SCHEMA = "doc_id long, text string, lang string, source string, ingest_ts timestamp"


def main(argv: list[str] | None = None) -> None:
    from proxyfeatureextraction_spark.streaming.stream_features import (
        stream_curate_docs,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--schema", default=DOC_SCHEMA)
    ap.add_argument("--ts-col", default="ingest_ts")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--min-line-words", type=int, default=1)
    ap.add_argument("--watermark", default="30 minutes")
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("pfx-stream-curate", master=args.master)
    stream = spark.readStream.schema(args.schema).parquet(args.input)
    # every source column that isn't consumed by the pipeline itself is
    # carried through to the sink (lang, source, ...) — the batch
    # follow-up passes (mixture resampling, DSIR, per-source reports)
    # need them, and a streaming sink column dropped here is gone
    passthrough = tuple(
        c for c in stream.columns if c not in ("doc_id", "text", args.ts_col)
    )
    curated = stream_curate_docs(
        stream,
        ts_col=args.ts_col,
        min_quality=args.min_quality,
        min_words_per_line=args.min_line_words,
        watermark=args.watermark,
        keep_cols=passthrough,
    )
    writer = (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - unbounded mode is not driveable in tests
        writer.start().awaitTermination()


if __name__ == "__main__":
    main()
