"""spark-submit entry: corpus curation → packing → partitioned write.

The training-data product flow as a CLI: quality filter → near-dup
removal → benchmark decontamination → split → (optionally) greedy
sequence packing of the kept train docs, written partitioned by split
so downstream training readers prune to their split at the scan.

Usage (cluster — spark-submit takes a script path, not a module flag):
    spark-submit --py-files pfx.zip \\
        proxyfeatureextraction_spark/jobs/curate.py \\
        --input <documents parquet> --eval <eval parquet> \\
        --output <curated dir> [--threshold 0.8] [--min-quality 0.0] \\
        [--weights train=0.98,val=0.01,test=0.01] [--decon-n 8] \\
        [--pack-tokens 0] [--pack-shards 256] [--seed 0]

Local smoke:
    python -m proxyfeatureextraction_spark.jobs.curate \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --eval /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/pfx_curated
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from proxyfeatureextraction_spark.session import get_spark


def parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        if not name or not val:
            raise ValueError(f"bad --weights entry {part!r} (want name=frac)")
        out[name] = float(val)
    return out


def main(argv: list[str] | None = None) -> None:
    from proxyfeatureextraction_spark.operators.curation import (
        curate_corpus,
        pack_sequences,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--eval", required=True, dest="eval_path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--weights", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--decon-n", type=int, default=8)
    ap.add_argument("--pack-tokens", type=int, default=0,
                    help="pack kept train docs into bins of this many tokens (0 = skip)")
    ap.add_argument("--pack-shards", type=int, default=256)
    ap.add_argument("--order-shards", type=int, default=0,
                    help="also write kept train docs in deterministic "
                         "training order across this many shards (0 = skip)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("pfx-curate", master=args.master)
    docs = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval_path)
    labels = curate_corpus(
        docs,
        eval_df,
        weights=parse_weights(args.weights),
        threshold=args.threshold,
        min_quality=args.min_quality,
        decon_n=args.decon_n,
        split_seed=args.seed,
    ).persist()
    # persist: the label DAG (quality + iterative dedup star rounds +
    # decontamination) feeds up to four actions below — without this
    # the most expensive stage of the job would recompute each time
    curated = docs.join(labels, "doc_id")
    (
        curated.write.mode("overwrite")
        .partitionBy("split")
        .parquet(f"{args.output}/docs")
    )
    summary = {
        "reasons": {
            r["reason"]: r["n"]
            for r in labels.groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    }
    if args.pack_tokens > 0:
        kept_train = curated.filter(F.col("keep") & (F.col("split") == "train"))
        packed = pack_sequences(
            kept_train, max_tokens=args.pack_tokens, n_shards=args.pack_shards,
            seed=args.seed,
        )
        packed.write.mode("overwrite").parquet(f"{args.output}/pack_plan")
        # count bins from the files just written — re-counting `packed`
        # would re-execute the whole packing DAG a second time
        summary["bins"] = (
            spark.read.parquet(f"{args.output}/pack_plan")
            .select("shard", "bin_id")
            .distinct()
            .count()
        )
    if args.order_shards > 0:
        from proxyfeatureextraction_spark.operators.curation import shuffle_shards

        kept_train = curated.filter(F.col("keep") & (F.col("split") == "train"))
        ordered = shuffle_shards(kept_train, n_shards=args.order_shards,
                                 seed=args.seed)
        # physical layout == logical order: one file per shard, rows
        # pre-sorted by shard_pos, so the data loader streams shards
        # sequentially with zero read-time shuffling
        (
            ordered.repartition(args.order_shards, "shard")
            .sortWithinPartitions("shard", "shard_pos")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{args.output}/train_ordered")
        )
        summary["order_shards"] = args.order_shards
    labels.unpersist()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
