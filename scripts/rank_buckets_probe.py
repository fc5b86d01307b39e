"""rank_buckets skew probe: the operator's one shuffle is the window
partition on group_cols — per-language strata distribute, but a
single-language corpus concentrates the whole sort in one partition
(the docstring's documented caveat). Measure both shapes at growing n
so the caveat carries a number.

Rows are (doc_id, score, lang) projections of spark.range — pure
synthetic, no testdata needed; scores are a hash so the sort is real
(not presorted).

Usage: python scripts/rank_buckets_probe.py [rows ...]
(default: 200000 800000 3200000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.sampling import rank_buckets


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [200_000, 800_000, 3_200_000]
    spark = build_session(app_name="rank-probe", cpus=32, shuffle_partitions=32)
    for n in sizes:
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.xxhash64(F.col("id")) % 1_000_003).cast("double").alias("s"),
            F.concat(F.lit("l"), (F.col("id") % 16)).alias("lang"),
        ).persist()
        base.count()
        rec = {"rows": n}
        for label, groups in (("one_stratum", ()), ("sixteen_strata", ("lang",))):
            t0 = time.monotonic()
            out = rank_buckets(
                base, "s", "doc_id", permille=(300, 400), group_cols=groups
            )
            counts = {
                r["bucket"]: r["count"]
                for r in out.groupBy("bucket").count().collect()
            }
            rec[label] = round(time.monotonic() - t0, 2)
            assert sum(counts.values()) == n, counts
        base.unpersist()
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
