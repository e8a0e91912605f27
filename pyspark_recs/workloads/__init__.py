"""Workload registry: every implemented operator exposed as a named query
over the driver testdata, each with a DuckDB oracle-SQL twin.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name] -> str``
feed /root/repo/__spark_entry__.py (the driver correctness contract).
"""

from pyspark_recs.workloads import llmops as _llmops
from pyspark_recs.workloads import recsys as _recsys
from pyspark_recs.workloads import relational as _relational
from pyspark_recs.workloads import streaming as _streaming

QUERIES = {}
ORACLE = {}
for _mod in (_relational, _llmops, _recsys, _streaming):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(getattr(_mod, "ORACLE", {}))

__all__ = ["QUERIES", "ORACLE"]
