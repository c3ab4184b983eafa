"""Round-6 optimization measurement harness (NOT the driver bench).

Per-query noop-sink isolation (guide §1.4) + .explain("formatted")
capture for the optimization round. bench.py stays frozen; this file
exists so per-query before/after numbers and plan snapshots can be
taken without touching the driver's timing methodology.

Usage:
  python bench_extra.py time  <query> [query ...]   best-of-N noop timings
  python bench_extra.py plan  <query> [out_dir]     write explain(formatted)
  python bench_extra.py all                         time every declared query

Env knobs (same contract as bench.py):
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local parallelism (default 32)
  PFX_BENCH_REPS       reps per query (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PFX_BENCH_REPS", "3"))


def _spark():
    from proxyfeatureextraction_spark import get_spark

    return get_spark("pfx-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def _warm(spark):
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(CPUS).mapInPandas(lambda it: it, "id long").count()


def time_queries(names: list[str]) -> None:
    import __spark_entry__ as E

    spark = _spark()
    _warm(spark)
    qs = E.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _run(qs[name](spark, SF_DIR))
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))


def plan_queries(names: list[str], out_dir: str) -> None:
    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "time":
        time_queries(sys.argv[2:])
    elif mode == "plan":
        names = [a for a in sys.argv[2:] if not a.startswith("/")]
        dirs = [a for a in sys.argv[2:] if a.startswith("/")]
        plan_queries(names, dirs[0] if dirs else "/tmp/plans_r06")
    else:
        import __spark_entry__ as E

        time_queries(list(E.queries()))


if __name__ == "__main__":
    main()
