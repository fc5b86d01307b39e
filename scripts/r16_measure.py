"""Round-16 optimization harness: time individual registry queries with
the bench's exact methodology (noop sink, warm run + best-of-N) and/or
dump their .explain("formatted") plans.

Usage:
    python scripts/r16_measure.py time q1 q2 ...      # or `all`
    python scripts/r16_measure.py explain q1 q2 ...   # plans to stdout
    python scripts/r16_measure.py explain --out plans/r16 --suffix before q1 ...

Timing output: one JSON line {name: {"best": s, "spread": s}} so
before/after comparisons in OPTIMIZATION_r16.md are copy-pasteable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.plans import spark_queries


def main() -> int:
    mode = sys.argv[1]
    args = sys.argv[2:]
    out_dir = None
    suffix = "before"
    names = []
    it = iter(args)
    for a in it:
        if a == "--out":
            out_dir = next(it)
        elif a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = build_session(app_name="asp-r16-measure", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = spark_queries()
    if names == ["all"]:
        names = sorted(queries)

    if mode == "explain":
        for name in names:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(out_dir, f"{name}_{suffix}.txt")
                with open(path, "w") as fh:
                    fh.write(plan)
                print(f"wrote {path}")
            else:
                print(f"==== {name} ====\n{plan}")
        spark.stop()
        return 0

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, dict[str, float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r16:{name}")
        t_build0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        build_s = time.perf_counter() - t_build0
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = {
            "best": round(min(samples), 4),
            "spread": round(max(samples) - min(samples), 4),
            "build": round(build_s, 4),
        }
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps(timings))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
