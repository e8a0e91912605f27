"""Command-line entry point: ``python -m pyspark_recs <cmd>``.

The reference's user drives everything from a shell (``dbt run``,
``python my_merlin_flow.py run``); this is the equivalent front door
for the Spark engine — every registry operator is runnable, listable
and explainable without writing a line of Python:

    python -m pyspark_recs list                      # all queries
    python -m pyspark_recs list --family rs          # one family
    python -m pyspark_recs run r01_pricing_summary   # show 20 rows
    python -m pyspark_recs run l91_maxsim_retrieval --explain
    python -m pyspark_recs run rs30_ensemble_eval --out /tmp/p.parquet
    python -m pyspark_recs oracle r22_zscore         # Spark vs DuckDB

``run`` prints rows (default), writes parquet (``--out``), or prints
the formatted physical plan (``--explain``). ``oracle`` executes the
query on Spark AND its DuckDB twin and reports the row/schema/hash
comparison — the same gate the driver applies.
"""

from __future__ import annotations

import argparse
import re
import sys


def _registry():
    from pyspark_recs.workloads import ORACLE, QUERIES

    return QUERIES, ORACLE


def cmd_list(args) -> int:
    queries, oracle = _registry()
    names = sorted(queries)
    if args.family:
        names = [
            n for n in names
            if re.match(r"[a-z]+", n).group(0) == args.family
        ]
    for n in names:
        fn = queries[n]
        doc = (fn.__doc__ or "").strip().split("\n")[0]
        mark = " " if n in oracle else "*"
        print(f"{mark}{n:36s} {doc[:80]}")
    print(f"\n{len(names)} queries (* = rows-only check, no SQL twin)")
    return 0


def cmd_run(args) -> int:
    from pyspark_recs.session import get_spark

    queries, _ = _registry()
    if args.query not in queries:
        print(f"unknown query: {args.query} (try `list`)", file=sys.stderr)
        return 2
    spark = get_spark(f"cli-{args.query}")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.n, truncate=False)
    return 0


def cmd_oracle(args) -> int:
    # tools/ is a repo-root namespace package, not installed — resolve
    # it from this file's location so `python -m pyspark_recs oracle`
    # works from any CWD (ADVICE r9).
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.oracle_check import main as oracle_main  # repo-root tools/

    return oracle_main([args.sf_dir, args.query])


def main() -> int:
    p = argparse.ArgumentParser(prog="python -m pyspark_recs")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("--family", choices=["r", "l", "rs", "s"])
    p_list.set_defaults(fn=cmd_list)

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_run.add_argument("--out", help="write result parquet here")
    p_run.add_argument("--explain", action="store_true",
                       help="print the physical plan instead of rows")
    p_run.add_argument("-n", type=int, default=20, help="rows to show")
    p_run.set_defaults(fn=cmd_run)

    p_or = sub.add_parser(
        "oracle", help="run Spark vs DuckDB twin and compare"
    )
    p_or.add_argument("query")
    p_or.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_or.set_defaults(fn=cmd_oracle)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
