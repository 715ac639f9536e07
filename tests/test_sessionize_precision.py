"""Sessionize gap math must be microsecond-precise.

``unix_timestamp`` truncates to whole seconds, so a gap of 1800.4 s
would have compared as 1800 (not > 1800 → same session) while the
oracle's fractional epoch sees a new session. The fix compares
``unix_micros`` deltas; these fixtures pin the boundary behavior.
"""

from __future__ import annotations

import datetime as dt

import pytest

from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import events_sessionize

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, ts, uid, "click", 1.0, "{}")
            for i, (uid, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture(scope="module")
def sessions_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("sess")
    rows = [
        # user 1: gap of exactly 1800.000000 s -> NOT > 1800 -> same session
        (1, BASE),
        (1, BASE + dt.timedelta(seconds=1800)),
        # user 2: gap of 1800.4 s -> new session (the truncation trap:
        # int(1800.4) == 1800 would wrongly keep one session)
        (2, BASE),
        (2, BASE + dt.timedelta(seconds=1800, microseconds=400_000)),
        # user 3: gap of 1800.000001 s -> new session at 1 us past the edge
        (3, BASE),
        (3, BASE + dt.timedelta(seconds=1800, microseconds=1)),
        # user 4: sub-second events stay together
        (4, BASE),
        (4, BASE + dt.timedelta(microseconds=999_999)),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


def test_boundary_gaps(spark, sessions_dir):
    out = events_sessionize(spark, sessions_dir)
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in out.collect()
    }
    assert got == {
        (1, 1): 2,  # exact 1800 s edge: same session
        (2, 1): 1,
        (2, 2): 1,  # 1800.4 s: split
        (3, 1): 1,
        (3, 2): 1,  # 1800.000001 s: split
        (4, 1): 2,  # sub-second: together
    }


def test_matches_duckdb_oracle(spark, sessions_dir):
    import duckdb

    import __spark_entry__ as entrymod
    from tools.check_oracle import canonical

    sql = entrymod.oracle_sql()["events_sessionize"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sessions_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sdf = events_sessionize(spark, sessions_dir)
    srows = [tuple(r) for r in sdf.collect()]
    assert canonical(srows, sdf.columns) == canonical(drows, dcols)
