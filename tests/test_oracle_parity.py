"""Every registered query with an oracle must match DuckDB at sf0.001
(fast gate; the driver runs sf0.01 — test_oracle_parity_sf001 mirrors it)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_harness import compare  # noqa: E402
from crawler_spark.plans import QUERIES, ORACLES  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    problems = compare(spark, name, QUERIES[name], ORACLES[name], SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
