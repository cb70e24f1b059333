"""Every queries() entry must match its oracle_sql() on sf0.001 —
the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import compare

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in _ORACLES:
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible)
        return
    compare(_QUERIES[name](spark, SF_DIR), _ORACLES[name], SF_DIR)
