"""Property-based check (hypothesis): for ANY small change log —
arbitrary interleaving of insert/update/delete per key, arbitrary batch
boundaries, with re-delivered duplicates — batch-applying through the
engine equals the single-threaded oracle reduction.

This is the §5 upgrade the reference lacks (scalacheck declared but
never used): the LWW/tombstone/merge state machine is exactly the kind
of logic where example tests miss interleavings.
"""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

KEYS = [("c1", 0), ("c1", 1), ("c2", 0)]


@st.composite
def change_logs(draw):
    """A short op sequence over 3 keys + batch split points + a set of
    events to re-deliver later."""
    n = draw(st.integers(min_value=1, max_value=12))
    ops = [
        (
            draw(st.sampled_from(KEYS)),
            draw(st.sampled_from(["insert", "update", "delete"])),
        )
        for _ in range(n)
    ]
    redeliver = draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=3))
    n_total = n + len(redeliver)
    n_batches = draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=max(1, n_total - 1)),
                max_size=n_batches - 1,
            )
        )
    )
    return ops, redeliver, cuts


def _rows(ops, redeliver):
    rows = []
    for lsn0, ((conv, turn), op) in enumerate(ops):
        lsn = lsn0 + 1
        payload = (
            "{}"
            if op == "delete"
            else json.dumps(
                {
                    "role": "user",
                    "text": f"v{lsn}",
                    "tool": None,
                    "ts": "2025-01-01T00:00:00",
                }
            )
        )
        rows.append(
            {
                "lsn": lsn,
                "ts": pd.Timestamp("2025-01-01").to_pydatetime(),
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "payload": payload,
                "schema_ver": 1,
                "source_part": 0,
            }
        )
    for idx in redeliver:
        rows.append(dict(rows[idx]))  # same lsn, same content, later position
    return rows


def _oracle(rows):
    """Global LWW by lsn; deletes drop the key."""
    best: dict[tuple, dict] = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if k not in best or r["lsn"] >= best[k]["lsn"]:
            best[k] = r
    return {
        k: json.loads(r["payload"])["text"]
        for k, r in best.items()
        if r["op"] != "delete"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(change_logs())
def test_any_interleaving_matches_oracle(spark, tmp_path_factory, log):
    ops, redeliver, cuts = log
    rows = _rows(ops, redeliver)
    work = tmp_path_factory.mktemp("prop")
    table = SnapshotTable.create(spark, str(work / "t"), n_buckets=2)
    bounds = [0] + cuts + [len(rows)]
    bid = 0
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = rows[lo:hi]
        if not chunk:
            continue
        df = spark.createDataFrame(chunk, schema=ENVELOPE_SCHEMA)
        apply_batch(df, table, bid, ApplyConfig(compact_max_files=2))
        bid += 1
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read_final().collect()
    }
    assert got == _oracle(rows)
