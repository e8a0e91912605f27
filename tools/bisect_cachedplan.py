"""A/B bisect for the round-7 l02/l04/l10 bench regression cluster.

Hypothesis under test (VERDICT r7 "what's wrong" / perf):
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``
(added in session.py round 7) re-plans the session-shared signature/
gram caches and slows the shingle/fingerprint family (l10 0.53->3.41s
warm, l02 0.18->1.27s, l04 cold 1.5->15.0s).

Protocol: per conf value, a FRESH subprocess session runs the cluster
queries in bench order with bench.py's exact 3-run discipline
(cold / JIT / measured) and the same checksum execution driver;
3 repetitions per variant. Prints a per-query median table.

Usage: python tools/bisect_cachedplan.py [n_reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The regression cluster plus its shared-cache neighbors, in bench
# (HEADLINE) relative order.
CLUSTER = [
    "l02_minhash_signatures",
    "l04_simhash",
    "l10_char_fingerprints",
    "l43_semantic_dedup",
    "rs11_copurchase_triangles",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "@@REPO@@")
conf_val = sys.argv[1]
sf_dir = sys.argv[2]
names = json.loads(sys.argv[3])

from pyspark_recs import session as S
S.RUNTIME_CONFS["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = conf_val
spark = S.get_spark("bisect")
from pyspark_recs.workloads import QUERIES
from pyspark_recs.io import load_table
from pyspark_recs.io.loaders import TABLES
from pyspark.sql import functions as F

spark.range(1000).selectExpr("sum(id)").collect()
for t in TABLES:
    load_table(spark, sf_dir, t).limit(1).collect()

def run_query(fn):
    df = fn(spark, sf_dir)
    df.select(F.expr("bit_xor(xxhash64(struct(*)))").alias("c")).collect()

out = {}
for name in names:
    fn = QUERIES[name]
    t0 = time.perf_counter(); run_query(fn)
    cold = time.perf_counter() - t0
    run_query(fn)
    t0 = time.perf_counter(); run_query(fn)
    out[name] = (round(cold, 3), round(time.perf_counter() - t0, 3))
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    child = _CHILD.replace("@@REPO@@", REPO)

    results: dict[str, dict[str, list]] = {
        v: {n: [] for n in CLUSTER} for v in ("true", "false")
    }
    for rep in range(n_reps):
        for conf_val in ("true", "false"):
            proc = subprocess.run(
                [sys.executable, "-c", child, conf_val, sf_dir,
                 json.dumps(CLUSTER)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT ")]
            if not line:
                print(proc.stdout[-2000:])
                print(proc.stderr[-2000:])
                raise SystemExit(f"child failed (conf={conf_val} rep={rep})")
            for name, (cold, warm) in json.loads(line[0][7:]).items():
                results[conf_val][name].append((cold, warm))
            print(f"rep {rep} conf={conf_val}: "
                  + " ".join(f"{n.split('_')[0]}={w}" for n, (c, w)
                             in json.loads(line[0][7:]).items()))

    print(f"\n{'query':34s} {'true cold/warm':>18s} {'false cold/warm':>18s}")
    for name in CLUSTER:
        tc = statistics.median(c for c, _ in results["true"][name])
        tw = statistics.median(w for _, w in results["true"][name])
        fc = statistics.median(c for c, _ in results["false"][name])
        fw = statistics.median(w for _, w in results["false"][name])
        print(f"{name:34s} {tc:8.2f}/{tw:8.2f} {fc:8.2f}/{fw:8.2f}")


if __name__ == "__main__":
    main()
