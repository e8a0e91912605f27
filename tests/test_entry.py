"""Driver-contract tests: entry() smoke, queries()/oracle_sql()
consistency, and a fast oracle spot-check at sf0.001.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 45
    # non-oracle queries are the deliberately non-SQL-expressible ones
    # (r27 regained an oracle in round 2 via its bounded-HLL check)
    assert {k for k in qs if k not in oracles} == {
        "l12_ann_lsh",
        "rs04_als_recommendations",
    }


def test_every_query_runs_at_smallest_sf(spark):
    """Every registered query must at least build+execute at sf0.001."""
    skip_heavy = set()  # all are cheap at sf0.001
    for name, fn in entry_mod.queries().items():
        if name in skip_heavy:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
