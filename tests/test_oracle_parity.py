"""Every oracle-paired query must match DuckDB exactly at sf0.01 — the local
replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_util import compare, duck_conn

import importlib

entry_mod = importlib.import_module("__spark_entry__")


def _names():
    return sorted(entry_mod.oracle_sql().keys())


@pytest.fixture(scope="module")
def con():
    c = duck_conn(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    res = compare(q(spark, SF_ORACLE), con, sql)
    assert res["match"], f"{name}: {res['first_diff']}"


def test_all_queries_have_entries():
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name in entry_mod.oracle_sql():
        assert name in qs
