"""Unit semantics for the round-3 temporal operators: range_join edge
cases (left join, empty/inverted intervals, bin-boundary exclusivity)
and hypertable_rollup validation. Corpus-level parity is covered by
test_oracle_parity[q_range_join] / [q_hypertable_rollup]."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audience_behavior_semantic_etl_spark.operators.joins import range_join
from audience_behavior_semantic_etl_spark.operators.rollup import hypertable_rollup


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:30:00")),
            (2, _ts("2024-01-01 02:00:00")),  # exactly on iv10's end -> excluded
            (3, _ts("2024-01-01 05:59:59")),
            (4, _ts("2024-03-01 00:00:00")),  # matches nothing
        ],
        "pid long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),
            (11, _ts("2024-01-01 04:00:00"), _ts("2024-01-01 06:00:00")),
            (12, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 09:00:00")),  # empty
            (13, _ts("2024-01-02 00:00:00"), _ts("2024-01-01 00:00:00")),  # inverted
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    return pts, ivs


def test_range_join_inner_semantics(spark):
    pts, ivs = _frames(spark)
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "ts", "start_ts", "end_ts", 3600).collect()
    }
    # end exclusive: pid 2 at exactly 02:00 does NOT match iv 10;
    # empty + inverted intervals match nothing (and the inverted one
    # must not fabricate bins via a negative sequence step)
    assert got == {(1, 10), (3, 11)}


def test_range_join_left_keeps_unmatched_points(spark):
    pts, ivs = _frames(spark)
    out = range_join(pts, ivs, "ts", "start_ts", "end_ts", 3600, how="left").collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    assert by_pid[2] == [None] and by_pid[4] == [None]
    assert by_pid[1] == [10] and by_pid[3] == [11]


def test_range_join_rejects_unknown_how(spark):
    pts, ivs = _frames(spark)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "ts", "start_ts", "end_ts", 3600, how="full")


def test_hypertable_rollup_buckets_and_granularities(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:15:00"), 1.0),
            ("a", _ts("2024-01-01 10:45:00"), 2.0),
            ("a", _ts("2024-01-01 11:05:00"), 4.0),
            ("b", _ts("2024-01-02 00:00:00"), 8.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = hypertable_rollup(
        df, "ts", {"n": F.count(F.lit(1)), "s": F.sum("v")},
        granularities=["hour", "day"], keys=["k"],
    ).collect()
    rows = {(r["granularity"], str(r["bucket_ts"]), r["k"]): (r["n"], r["s"]) for r in out}
    assert rows[("hour", "2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert rows[("hour", "2024-01-01 11:00:00", "a")] == (1, 4.0)
    assert rows[("day", "2024-01-01 00:00:00", "a")] == (3, 7.0)
    assert rows[("day", "2024-01-02 00:00:00", "b")] == (1, 8.0)
    # every row is tagged with exactly one granularity
    assert all(r["granularity"] in ("hour", "day") for r in out)


def test_hypertable_rollup_rejects_unknown_granularity(spark):
    df = spark.createDataFrame([("a", _ts("2024-01-01 00:00:00"), 1.0)], "k string, ts timestamp, v double")
    with pytest.raises(ValueError):
        hypertable_rollup(df, "ts", {"n": F.count(F.lit(1))}, granularities=["month"])


def test_cdc_startup_maintenance_reports_resume_state(spark, tmp_path):
    import json

    import pandas as pd

    from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
    from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA
    from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

    def env(rows):
        pdf = pd.DataFrame(
            [
                {
                    "lsn": lsn, "ts": pd.Timestamp("2025-01-01"), "op": "insert",
                    "conv_id": "c", "turn_idx": t,
                    "payload": json.dumps({"role": "user", "text": "x", "tool": None,
                                           "ts": "2025-01-01T00:00:00"}),
                    "schema_ver": 1, "source_part": 0,
                }
                for lsn, t in rows
            ]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return spark.createDataFrame(pdf, schema=ENVELOPE_SCHEMA)

    table = SnapshotTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    apply_batch(env([(1, 0), (2, 1)]), table, 0, ApplyConfig(app_id="app-x"))
    v = table.manifest().version
    # new-process handle resumes with maintenance-first
    t2 = SnapshotTable(spark, table.root)
    rep = t2.startup_maintenance()
    assert rep["version"] == v
    assert rep["committed_batches"]["app-x"] == 0
    assert t2.read_final().count() == 2


def test_range_join_property_matches_bruteforce(spark):
    """Randomized check: bin-bucketed range join == brute-force
    containment over random points/intervals, across bin widths that
    divide, straddle, and dwarf the interval lengths."""
    import random

    rnd = random.Random(1234)
    base = dt.datetime(2024, 1, 1)
    pts = [(i, base + dt.timedelta(seconds=rnd.randrange(0, 400_000))) for i in range(300)]
    ivs = []
    for j in range(60):
        s = rnd.randrange(0, 380_000)
        ln = rnd.choice([0, 1, 59, 3600, 7201, 90_000])
        ivs.append((j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + ln)))
    pdf = spark.createDataFrame(pts, "pid long, ts timestamp")
    idf = spark.createDataFrame(ivs, "iid long, start_ts timestamp, end_ts timestamp")
    want = {
        (p, i)
        for p, t in pts
        for i, s, e in ivs
        if s <= t < e
    }
    for bin_s in (60, 3600, 86_400):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(pdf, idf, "ts", "start_ts", "end_ts", bin_s).collect()
        }
        assert got == want, f"bin_seconds={bin_s}"
