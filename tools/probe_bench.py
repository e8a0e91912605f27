"""In-session bench-protocol probe for A/B decisions: for each named
query, run the EXACT bench measurement (checksum driver, 2 warm-ups,
then N measured runs) in one shared session and print all run times —
so a code A/B compares the same protocol the driver's bench uses,
with enough reps to see the spread.

Usage: python tools/probe_bench.py [sf_dir] [n_runs] <query> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3:]

    from pyspark.sql import functions as F

    from pyspark_recs.session import get_spark
    from pyspark_recs.workloads import QUERIES

    spark = get_spark("probe-bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_query(fn):
        df = fn(spark, sf)
        df.select(
            F.expr("bit_xor(xxhash64(struct(*)))").alias("checksum")
        ).collect()

    for name in names:
        fn = QUERIES[name]
        run_query(fn)
        run_query(fn)
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            run_query(fn)
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[len(runs) // 2]
        print(
            "PROBE "
            + json.dumps({"query": name, "median": med, "runs": runs}),
            flush=True,
        )
    from pyspark_recs.workloads.common import unpersist_shared

    unpersist_shared(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
