"""Extra benchmarks for optimization work (guide §1.4): per-query timing
with the same count() methodology as bench.py, optional noop-sink isolation,
and .explain("formatted") capture — WITHOUT touching the frozen bench.py.

Usage:
  python bench_extra.py q1 q2 ...            # time named queries (count, best-of-N)
  python bench_extra.py --all                # every HEADLINE query
  python bench_extra.py --explain q1 ...     # write plans/r06/<q>_<tag>.txt
  python bench_extra.py --noop q1 ...        # noop-sink materialization timing
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "2"))


def main() -> None:
    args = sys.argv[1:]
    explain = "--explain" in args
    noop = "--noop" in args
    tag = "before"
    for a in list(args):
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
            args.remove(a)
    args = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as E
    from bench import HEADLINE
    from autoextract.session import get_spark

    names = HEADLINE if not args else args
    spark = get_spark(app_name="bench-extra", parallelism=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = E.queries()
    timings: dict[str, float] = {}
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        if name == "span_pipeline":
            from bench import _span_pipeline_docs

            fn = lambda s, d: _span_pipeline_docs(s, d)  # noqa: E731
        else:
            fn = qs[name]
        if explain:
            df = fn(spark, SF_DIR)
            path = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}")
            continue
        runs = []
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"bench-extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.monotonic() - t0, 3))
        timings[name] = min(runs)
        print(json.dumps({"query": name, "best": min(runs), "runs": runs}),
              flush=True)
    if timings:
        print(json.dumps({"sf_dir": SF_DIR, "total": round(sum(timings.values()), 3),
                          "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
