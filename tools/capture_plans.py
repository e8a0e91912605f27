"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> <query> [<query> ...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix = before/after).

Streaming-executed rows (s18+) EXECUTE a streaming query inside the row
function; the captured plan is the plan of the returned (read-back)
DataFrame — the part the optimizer sees — which is still the honest
artifact for them because their cost is the streaming machinery, not the
read-back plan (documented per-row in OPTIMIZATION notes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark_recs.session import get_spark
    from pyspark_recs.workloads import QUERIES

    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
