"""spark-submit entry: resumable transcript feature extraction.

Usage (cluster — spark-submit takes a script path, not a module flag):
    spark-submit --py-files pfx.zip proxyfeatureextraction_spark/jobs/extract.py \\
        --input <transcripts parquet/iceberg> --output <feature table dir> \\
        [--pkt-limit 20] [--gateway] [--seed 42] [--transforms pad,jitter]

Local smoke:
    python -m proxyfeatureextraction_spark.jobs.extract \\
        --input /tmp/pfx_bench/convs_3000 --output /tmp/pfx_out
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from proxyfeatureextraction_spark import schema as S
from proxyfeatureextraction_spark.session import get_spark
from proxyfeatureextraction_spark.sources.checkpoint import run_resumable


def build(pkt_limit: int, gateway: bool, transforms: list[str], seed: int):
    from proxyfeatureextraction_spark.operators import transforms as TR
    from proxyfeatureextraction_spark.plans.extract import extract_features
    from proxyfeatureextraction_spark.schema import with_derived

    chain_map = {
        "bias": TR.bias_removal({}),
        "decorr": TR.decorrelation({}),
        "pad": TR.targeted_padding(),
        "jitter": TR.ipd_jitter(),
        "reshape": TR.reshaping(),
    }

    def _build(raw):
        if transforms:
            raw = TR.apply_transforms(
                raw, [chain_map[t] for t in transforms], pkt_limit=pkt_limit, run_seed=seed
            )
        d = with_derived(raw)
        gw = d.select(S.TS_SEC, S.N_CHARS) if gateway else None
        feats = extract_features(d, gw, pkt_limit=pkt_limit)
        # carry the partition column for manifesting — ONE folder per
        # conv (min, deterministic): a distinct (folder, conv) pair list
        # would duplicate every feature row of a conv that appears under
        # two capture folders and double-count the partition manifests
        folders = d.groupBy(S.CONV).agg(F.min(S.FOLDER).alias(S.FOLDER))
        return feats.drop(S.FOLDER).join(folders, S.CONV, "left")

    return _build


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pkt-limit", type=int, default=20)
    ap.add_argument("--gateway", action="store_true")
    ap.add_argument("--transforms", default="")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("pfx-extract", master=args.master)
    chain = [t for t in args.transforms.split(",") if t]
    summary = run_resumable(
        spark, args.input, args.output, build(args.pkt_limit, args.gateway, chain, args.seed)
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
