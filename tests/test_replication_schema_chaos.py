"""Seeded schema-evolution CHAOS over the replication pipe: random
source DDL (add / rename / drop / re-add / widen) interleaved with
traffic batches and availableNow drains. After every drain the
replica's final state must equal the source's on the source's CURRENT
columns — the pipe's rename-follow, recycled-name (drop + re-add)
follow, widening follow, and mask-resolution paths composed in random
orders, checked against the source table itself (whose own semantics
are pinned by the rest of the suite).

Deterministic seeds, no flaky search; each drain restarts the stream
(availableNow), so every batch is pinned on the source's CURRENT era —
the documented CDF contract this engine inherits."""

from __future__ import annotations

import itertools
import json
import random

import pandas as pd
import pytest

from audience_behavior_semantic_etl_spark.cdc.apply import ApplyConfig, apply_batch
from audience_behavior_semantic_etl_spark.cdc.replicate import replicate_stream
from audience_behavior_semantic_etl_spark.cdc.schema import ENVELOPE_SCHEMA
from audience_behavior_semantic_etl_spark.cdc.table import SnapshotTable

_KEYS = [f"conv-{i}" for i in range(6)]
_NAME_POOL = ["tag", "score", "model", "grade", "stage"]


def _envelope(spark, rows):
    pdf = pd.DataFrame(
        [
            {
                "lsn": lsn,
                "ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=lsn),
                "op": op,
                "conv_id": conv,
                "turn_idx": 0,
                "payload": json.dumps(payload),
                "schema_ver": 1,
                "source_part": 0,
            }
            for lsn, op, conv, payload in rows
        ]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf, schema=ENVELOPE_SCHEMA)


def _compare(a: SnapshotTable, b: SnapshotTable) -> None:
    cols = ["conv_id", "turn_idx"] + sorted(
        n for n, _ in a.manifest().columns if n not in ("conv_id", "turn_idx")
    )
    want = (
        a.read_final().select(*cols).toPandas().astype(str)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got = (
        b.read_final().select(*cols).toPandas().astype(str)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("seed", [11, 29])
def test_replication_schema_chaos(spark, tmp_path, seed):
    rng = random.Random(seed)
    a = SnapshotTable.create(spark, str(tmp_path / "a"), n_buckets=2)
    b = SnapshotTable.create(spark, str(tmp_path / "b"), n_buckets=2)
    ckpt = str(tmp_path / "ckpt")
    cfg = ApplyConfig(app_id="src", auto_compact=False, shuffle_partitions=4)
    rcfg = ApplyConfig(auto_compact=False, shuffle_partitions=4)
    lsn = itertools.count(1)
    batch_id = itertools.count(0)

    def cols_now():
        return [
            (n, t) for n, t in a.manifest().columns
            if n not in ("conv_id", "turn_idx")
        ]

    def value_for(rng, typ, n):
        if typ in ("int", "long"):
            # post-widen values exceed int32 to catch narrow casts
            return (2**31 + n) if typ == "long" else n % 1000
        if typ.startswith("timestamp"):
            return f"2025-01-01T00:{n % 60:02d}:{n % 60:02d}"
        if typ in ("float", "double"):
            return n / 4.0
        return f"v{n}"

    def traffic():
        rows = []
        for _ in range(rng.randint(3, 8)):
            conv = rng.choice(_KEYS)
            op = rng.choice(["insert", "insert", "update", "update_partial", "delete"])
            n = next(lsn)
            if op == "delete":
                rows.append((n, "delete", conv, {}))
                continue
            cs = cols_now()
            if op == "update_partial":
                cs = rng.sample(cs, k=max(1, rng.randint(1, len(cs)) // 2))
            payload = {c: value_for(rng, t, n) for c, t in cs}
            rows.append((n, "insert" if op == "insert" else "update", conv, payload)
                        if op != "update_partial"
                        else (n, "update_partial", conv, payload))
        apply_batch(_envelope(spark, rows), a, next(batch_id), cfg)

    def ddl():
        names = [n for n, _ in cols_now()]
        action = rng.choice(["add", "rename", "drop", "widen"])
        if action == "add":
            fresh = [n for n in _NAME_POOL if n not in names]
            # rng.choice over a possibly re-used name exercises the
            # recycled-name (drop + re-add) follow
            pool = fresh + [n for n in _NAME_POOL if n not in names]
            if not pool:
                return
            a.add_columns({rng.choice(pool): rng.choice(["string", "int"])})
        elif action == "rename" and names:
            old = rng.choice(names)
            new = f"{old}_r{next(lsn)}"
            a.rename_columns({old: new})
        elif action == "drop" and len(names) > 2:
            a.drop_columns([rng.choice(names)])
        elif action == "widen":
            ints = [n for n, t in cols_now() if t == "int"]
            if ints:
                a.widen_columns({rng.choice(ints): "long"})

    traffic()
    replicate_stream(a, b, ckpt, apply_cfg=rcfg).awaitTermination(300)
    _compare(a, b)
    for _ in range(6):
        for _ in range(rng.randint(1, 2)):
            ddl()
        traffic()
        replicate_stream(a, b, ckpt, apply_cfg=rcfg).awaitTermination(300)
        _compare(a, b)
