"""Per-partition checkpoint manifests + resumable runs (SURVEY.md S8).

The reference has no checkpointing (batch numbering only,
``data_io.py:87``). This layer makes extraction idempotent and
resumable at ingest-partition (``folder_name``) granularity:

- output parquet is written ``partitionBy(folder_name)``;
- each completed partition gets a JSON manifest carrying lineage:
  partition id, input fingerprint, row count, order-insensitive
  feature checksum, wall time, engine version;
- a re-run lists manifests first and processes only missing
  partitions — killed runs resume where they stopped.

On an Iceberg deployment the input fingerprint is the snapshot id
(``VERSION AS OF`` pinning); the sandbox has no Iceberg runtime jar, so
the fallback fingerprints the parquet file listing. Both go through
``input_fingerprint``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proxyfeatureextraction_spark import __version__
from proxyfeatureextraction_spark import schema as S

MANIFEST_DIR = "_manifests"


def input_fingerprint(spark, path: str) -> str:
    """Snapshot id on Iceberg; recursive file-listing hash otherwise.

    The fallback must see REAL input changes (review-hardened): local
    directories are walked recursively (partitioned datasets keep their
    data files in subdirectories — a top-level listdir hashes only
    unchanging directory entries) hashing relpath:size:mtime_ns per
    data file, so a same-size in-place rewrite still changes the
    fingerprint. Non-local paths (s3://, hdfs://) hash the dataset's
    resolved file listing PLUS each file's length and modification time
    (fetched with one Hadoop ``FileSystem.listStatus`` per directory
    through the JVM gateway), so a same-name in-place rewrite on a
    remote store changes the fingerprint just like the local branch;
    files whose status cannot be fetched degrade to name-only."""
    try:  # Iceberg table identifier?
        snap = spark.sql(f"SELECT snapshot_id FROM {path}.snapshots ORDER BY committed_at DESC LIMIT 1")
        return f"iceberg:{snap.first()[0]}"
    except Exception:  # noqa: BLE001 — not an Iceberg table / no runtime
        pass
    h = hashlib.blake2b(digest_size=16)
    if os.path.isdir(path):
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            for name in sorted(files):
                if name.startswith("."):
                    continue  # hidden temp files (._COPYING_ etc.)
                st = os.stat(os.path.join(root, name))
                rel = os.path.relpath(os.path.join(root, name), path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        try:  # remote FS: hash the resolved listing + size + mtime
            files = sorted(spark.read.parquet(path).inputFiles())
            meta: dict[str, tuple[int, int]] = {}
            try:
                jvm = spark._jvm
                conf = spark._jsc.hadoopConfiguration()
                by_dir: dict[str, set[str]] = {}
                for f in files:
                    d, _, name = f.rpartition("/")
                    by_dir.setdefault(d, set()).add(name)
                for d, names in sorted(by_dir.items()):
                    dp = jvm.org.apache.hadoop.fs.Path(d)
                    fs = dp.getFileSystem(conf)
                    for st in fs.listStatus(dp):
                        nm = st.getPath().getName()
                        if nm in names:
                            meta[f"{d}/{nm}"] = (
                                st.getLen(),
                                st.getModificationTime(),
                            )
            except Exception:  # noqa: BLE001 — status unavailable: name-only
                meta = {}
            for f in files:
                sz, mt = meta.get(f, (-1, -1))
                h.update(f"{f}:{sz}:{mt}".encode())
        except Exception:  # noqa: BLE001 — unreadable: path-only fallback
            h.update(path.encode())
    return f"files:{h.hexdigest()}"


def _manifest_path(out_dir: str, partition: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{partition}.json")


def completed_partitions(out_dir: str, fingerprint: str | None = None) -> set[str]:
    """Partitions with a manifest, optionally filtered to the given input.

    With ``fingerprint`` set, a manifest written against a *different*
    input fingerprint does not count as completed — the partition is
    stale and must be re-extracted (a resume after the input dataset
    changed must not silently keep old features)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    names = {f[:-5] for f in os.listdir(mdir) if f.endswith(".json")}
    if fingerprint is None:
        return names
    fresh = set()
    for name in names:
        try:
            with open(_manifest_path(out_dir, name)) as fh:
                if json.load(fh).get("input_fingerprint") == fingerprint:
                    fresh.add(name)
        except (OSError, ValueError):  # unreadable manifest → re-extract
            pass
    return fresh


def feature_checksums(features: DataFrame, partition_col: str) -> dict[str, tuple[int, int]]:
    """(row_count, order-insensitive value checksum) per partition."""
    num_cols = [
        f.name
        for f in features.schema.fields
        if f.name not in (partition_col, S.CONV) and f.dataType.typeName() in ("double", "float", "integer", "long")
    ]
    # modular row hash: summable without ANSI long overflow
    row_hash = F.pmod(
        F.xxhash64(S.CONV, *[F.round(F.col(c).cast("double"), 6) for c in num_cols]),
        F.lit(1_000_000_007),
    )
    agg = features.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(row_hash).alias("checksum"),
    )
    return {r[partition_col]: (r["rows"], r["checksum"]) for r in agg.collect()}


def write_manifest(
    out_dir: str,
    partition: str,
    rows: int,
    checksum: int,
    wall_sec: float,
    fingerprint: str,
) -> None:
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    payload = {
        "partition": partition,
        "rows": int(rows),
        "feature_checksum": int(checksum) if checksum is not None else None,
        "wall_sec": round(wall_sec, 3),
        "input_fingerprint": fingerprint,
        "engine_version": __version__,
        "completed_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    tmp = _manifest_path(out_dir, partition) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, _manifest_path(out_dir, partition))


def run_resumable(
    spark,
    in_path: str,
    out_dir: str,
    build_features,
    partition_col: str = S.FOLDER,
) -> dict:
    """Extract features for all partitions not yet manifested.

    ``build_features(raw_df) -> feature_df`` must carry
    ``partition_col`` through. Returns a summary dict.
    """
    raw = spark.read.parquet(in_path)
    fp = input_fingerprint(spark, in_path)
    all_parts = [r[0] for r in raw.select(partition_col).distinct().collect()]
    done = completed_partitions(out_dir, fingerprint=fp)
    stale = completed_partitions(out_dir) - done
    pending = sorted((set(all_parts) - done) | (stale & set(all_parts)))
    if not pending:
        return {"skipped": len(done), "processed": 0, "stale": 0, "fingerprint": fp}

    t0 = time.perf_counter()
    subset = raw.filter(F.col(partition_col).isin(pending))
    feats = build_features(subset)
    # Drop the pending partitions' old files FIRST: dynamic overwrite
    # only replaces partitions PRESENT in the new data, so a stale
    # partition whose rebuild yields zero rows would keep its old
    # parquet files — and the read-back below would then manifest that
    # leftover stale data as fresh. (Cluster equivalent: ALTER TABLE …
    # DROP PARTITION / an Iceberg overwrite of the affected partitions.)
    import shutil

    for part in pending:
        pdir = os.path.join(out_dir, f"{partition_col}={part}")
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
    (
        feats.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir)
    )
    wall = time.perf_counter() - t0
    sums = feature_checksums(spark.read.parquet(out_dir).filter(
        F.col(partition_col).isin(pending)
    ), partition_col)
    per_part_wall = wall / max(len(pending), 1)
    for part in pending:
        rows, chk = sums.get(part, (0, 0))
        write_manifest(out_dir, part, rows, chk, per_part_wall, fp)
    return {
        "skipped": len(done),
        "processed": len(pending),
        "stale": len(stale & set(all_parts)),
        "fingerprint": fp,
        "wall_sec": wall,
    }
