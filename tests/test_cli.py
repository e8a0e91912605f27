"""CLI front-door tests: `python -m pyspark_recs` list/run surfaces."""

from __future__ import annotations

import argparse
import io
import contextlib

from pyspark_recs.__main__ import cmd_list, cmd_run


def test_cli_list_counts_every_registry_query():
    from pyspark_recs.workloads import QUERIES

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cmd_list(argparse.Namespace(family=None))
    assert rc == 0
    out = buf.getvalue()
    assert f"{len(QUERIES)} queries" in out
    assert "r01_pricing_summary" in out

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cmd_list(argparse.Namespace(family="rs"))
    rs_out = buf.getvalue()
    assert "rs01_interactions" in rs_out
    assert "l01_exact_dedup" not in rs_out


def test_cli_run_explain_and_rows(spark, capsys):
    ns = argparse.Namespace(
        query="r09_left_join_defaults",
        sf_dir="/root/testdata/sf0.001",
        out=None,
        explain=True,
        n=5,
    )
    assert cmd_run(ns) == 0
    assert "Physical Plan" in capsys.readouterr().out
    ns.explain = False
    assert cmd_run(ns) == 0
    shown = capsys.readouterr().out
    assert "+--" in shown  # df.show() table border actually rendered
    assert cmd_run(
        argparse.Namespace(
            query="no_such_query", sf_dir="x", out=None, explain=False, n=5
        )
    ) == 2
