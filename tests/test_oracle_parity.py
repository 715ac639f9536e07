"""Every registered query with an oracle must match DuckDB on sf0.001.

This is the in-repo mirror of the driver's t2 gate (run at the smoke
scale so the suite stays fast; tools/check_oracle.py runs sf0.01).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import canonical

from .conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert srows is not None
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert canonical(srows, sdf.columns) == canonical(drows, dcols), (
        f"{name}: value mismatch"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
