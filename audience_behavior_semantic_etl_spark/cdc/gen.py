"""Deterministic synthetic WAL generator + pandas oracle
(FIXTURES.md §A2: ~60% insert / ~30% update / ~8% delete keys, ~2%
re-delivered duplicates, one schema_change, Zipf-skewed conversations).

Pure function of ``(seed, n_convs, ...)`` — no external data, no wall
clock. The oracle (`expected_final_state`) reduces the same log
single-threaded in pandas, independently of any Spark code, so engine
output can be asserted byte-equal per turn.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

import numpy as np
import pandas as pd

from audience_behavior_semantic_etl_spark.cdc.normalize import canonical_text

BASE_EPOCH = pd.Timestamp("2025-01-01 00:00:00")

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["bash", "search", "python", "browser"]
_WORDS = (
    "merge spark stream shuffle window batch table turn agent tool reply "
    "plan query state commit offset snapshot replay skew salt bucket"
).split()


def _h(*parts: object) -> int:
    return int.from_bytes(
        hashlib.sha256("|".join(map(str, parts)).encode()).digest()[:8], "big"
    )


def _text(seed: int, conv: str, turn: int, version: int) -> str:
    """Deterministic per-(key, version) text with seeded messiness:
    decomposed unicode, CRLF, trailing spaces, control chars — so the
    canonicalizer is actually exercised (canonical form is stable)."""
    h = _h(seed, conv, turn, version)
    words = [_WORDS[(h >> (i * 5)) % len(_WORDS)] for i in range(8)]
    body = " ".join(words)
    mess = h % 4
    if mess == 1:
        body = "café " + body + "  \r\nnext line\t"
    elif mess == 2:
        body = body + " café\x07"  # BEL control char, composed e-acute
    elif mess == 3:
        body = body.replace(" ", "  ", 1) + " \n"
    return f"t{version}: {body}"


@dataclass
class GenConfig:
    seed: int = 42
    n_convs: int = 200
    mean_turns: int = 12
    update_frac: float = 0.5  # updates per base insert (expectation)
    delete_key_frac: float = 0.08
    redeliver_frac: float = 0.02
    n_source_parts: int = 4
    schema_change_at: float = 0.5  # fraction of the log
    zipf_s: float = 1.2


def generate_change_log(cfg: GenConfig) -> pd.DataFrame:
    """Build the WAL as a pandas DataFrame in stream order.

    Columns match ENVELOPE_SCHEMA; ``payload`` is a JSON after-image.
    Within a key, events are lsn-ordered (chain order preserved under
    the global interleave); re-delivered duplicates carry their
    ORIGINAL lsn and appear later in the stream.
    """
    rng = np.random.default_rng(cfg.seed)
    convs = [f"conv-{i:08d}" for i in range(cfg.n_convs)]
    # Zipf-ish weights: hot conversations get more updates (skew for the
    # salting path).
    weights = 1.0 / np.arange(1, cfg.n_convs + 1) ** cfg.zipf_s
    weights /= weights.sum()

    turns_per_conv = np.minimum(
        rng.geometric(1.0 / cfg.mean_turns, size=cfg.n_convs), 4 * cfg.mean_turns
    )

    # --- build per-key event chains (insert -> updates -> maybe delete)
    chain_key: list[tuple[int, int]] = []  # (conv_i, turn)
    chain_op: list[str] = []
    chain_ver: list[int] = []
    n_updates_target = int(cfg.update_frac * turns_per_conv.sum())
    upd_conv = rng.choice(cfg.n_convs, size=n_updates_target, p=weights)
    upd_counts: dict[tuple[int, int], int] = {}
    for ci in upd_conv:
        t = int(rng.integers(0, turns_per_conv[ci]))
        upd_counts[(ci, t)] = upd_counts.get((ci, t), 0) + 1
    del_keys = set()
    for ci in range(cfg.n_convs):
        for t in range(int(turns_per_conv[ci])):
            if rng.random() < cfg.delete_key_frac:
                del_keys.add((ci, t))
    for ci in range(cfg.n_convs):
        for t in range(int(turns_per_conv[ci])):
            chain_key.append((ci, t)); chain_op.append("insert"); chain_ver.append(1)
            for v in range(upd_counts.get((ci, t), 0)):
                chain_key.append((ci, t)); chain_op.append("update"); chain_ver.append(2 + v)
            if (ci, t) in del_keys:
                chain_key.append((ci, t)); chain_op.append("delete"); chain_ver.append(0)

    n = len(chain_key)
    # --- interleave chains preserving intra-chain order: draw a random
    # time per event, sort times WITHIN each chain, then global sort.
    times = rng.random(n)
    df = pd.DataFrame(
        {
            "conv_i": [k[0] for k in chain_key],
            "turn_idx": [k[1] for k in chain_key],
            "op": chain_op,
            "version": chain_ver,
            "t": times,
        }
    )
    df["t"] = df.groupby(["conv_i", "turn_idx"])["t"].transform(np.sort)
    df = df.sort_values(["t", "conv_i", "turn_idx"], kind="mergesort").reset_index(drop=True)
    df["lsn"] = np.arange(1, n + 1, dtype=np.int64)

    evolution_lsn = int(n * cfg.schema_change_at) + 1

    # --- payloads
    def payload_row(r) -> tuple[str, str, int]:
        conv = convs[r.conv_i]
        if r.op == "delete":
            return "{}", conv, 1
        # ~15% tool rows, rest alternating user/assistant; role is a
        # pure function of (conv, turn) so updates never change it.
        hrole = _h(cfg.seed, conv, r.turn_idx, "role")
        if hrole % 100 < 15:
            role = "tool"
        else:
            role = "user" if r.turn_idx % 2 == 0 else "assistant"
        is_tool = role == "tool"
        tool = _TOOLS[_h(cfg.seed, conv, r.turn_idx, "tool") % len(_TOOLS)] if is_tool else None
        ts_iso = (BASE_EPOCH + pd.Timedelta(seconds=int(r.lsn))).isoformat()
        p = {
            "role": role,
            "text": _text(cfg.seed, conv, r.turn_idx, max(int(r.version), 1)),
            "tool": tool,
            "ts": ts_iso,
            "meta": {"v": str(int(r.version))},
        }
        ver = 1
        if r.lsn > evolution_lsn:
            ver = 2
            if is_tool:
                p["tool_meta"] = {
                    "name": tool,
                    "latency_ms": int(_h(cfg.seed, conv, r.turn_idx, "lat") % 5000),
                }
        return json.dumps(p), conv, ver

    payloads, conv_ids, vers = [], [], []
    for r in df.itertuples():
        pj, conv, ver = payload_row(r)
        payloads.append(pj); conv_ids.append(conv); vers.append(ver)
    df["payload"] = payloads
    df["conv_id"] = conv_ids
    df["schema_ver"] = np.array(vers, dtype=np.int32)
    df["ts"] = BASE_EPOCH + pd.to_timedelta(df["lsn"].astype("int64"), unit="s")
    df["source_part"] = (
        pd.util.hash_pandas_object(df["conv_id"], index=False) % cfg.n_source_parts
    ).astype(np.int32)

    out = df[["lsn", "ts", "op", "conv_id", "turn_idx", "payload", "schema_ver", "source_part"]]

    # --- schema_change event at the evolution point (its own lsn slot
    # is spliced into stream order by sorting on lsn with a half slot)
    sc = pd.DataFrame(
        {
            "lsn": [evolution_lsn],
            "ts": [BASE_EPOCH + pd.Timedelta(seconds=evolution_lsn)],
            "op": ["schema_change"],
            "conv_id": [None],
            "turn_idx": [pd.NA],
            "payload": [json.dumps({"add_columns": {"tool_name": "string", "tool_latency_ms": "long"}})],
            "schema_ver": [2],
            "source_part": [0],
        }
    )
    # shift data lsns >= evolution point up by one so lsn stays unique
    out = out.copy()
    out.loc[out["lsn"] >= evolution_lsn, "lsn"] += 1
    full = pd.concat([out, sc], ignore_index=True).sort_values("lsn").reset_index(drop=True)

    # --- re-delivered duplicates: copies of earlier data events (same
    # lsn + content) appended later in stream order.
    n_dup = int(len(full) * cfg.redeliver_frac)
    if n_dup:
        dup_idx = rng.choice(len(full) - 1, size=n_dup, replace=False)
        dups = full.iloc[dup_idx]
        dups = dups[dups["op"] != "schema_change"]
        # stream position: insert each duplicate at a random later point
        full["__pos"] = np.arange(len(full), dtype=np.float64)
        dpos = dups.index.to_numpy(dtype=np.float64)
        dups = dups.assign(__pos=dpos + rng.uniform(1.0, len(full) - dpos))
        full = pd.concat([full, dups], ignore_index=True)
        full = full.sort_values("__pos", kind="mergesort").drop(columns="__pos").reset_index(drop=True)

    full["turn_idx"] = full["turn_idx"].astype("Int32")
    full["lsn"] = full["lsn"].astype("int64")
    full["schema_ver"] = full["schema_ver"].astype("int32")
    full["source_part"] = full["source_part"].astype("int32")
    return full


def expected_final_state(log: pd.DataFrame) -> pd.DataFrame:
    """Independent single-threaded oracle: reduce the log to the final
    table state (LWW by lsn; deletes drop the key; text canonicalized;
    v2 payloads populate tool_name/tool_latency_ms). When the log
    carries ``update_partial`` events (sparse after-images), the
    reduction is COLUMN-level: replay each key's events in lsn order,
    full-row ops reset every column, patches overwrite exactly the
    keys present in their payload (an explicit JSON null overwrites
    with null); keys whose lsn-max full-row op is a delete drop."""
    data = log[log["op"] != "schema_change"].copy()
    if (data["op"] == "update_partial").any():
        return _expected_final_state_fold(data)
    data = data.sort_values("lsn", kind="mergesort").drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    data = data[data["op"] != "delete"]
    rows = []
    for r in data.itertuples():
        p = json.loads(r.payload)
        tm = p.get("tool_meta") or {}
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": int(r.turn_idx),
                "role": p.get("role"),
                "text": canonical_text(p.get("text")),
                "tool": p.get("tool"),
                "ts": pd.Timestamp(p["ts"]) if p.get("ts") else None,
                "tool_name": tm.get("name"),
                "tool_latency_ms": tm.get("latency_ms"),
            }
        )
    out = pd.DataFrame(rows)
    if len(out):
        out["tool_latency_ms"] = out["tool_latency_ms"].astype("Int64")
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return out


def _expected_final_state_fold(data: pd.DataFrame) -> pd.DataFrame:
    """Column-level replay for logs with sparse after-images: events
    per key in lsn order; full-row ops (insert/update/delete) reset the
    whole row, patches overwrite exactly their payload's keys — an
    explicit JSON null overwrites with null, which is why presence is
    keyed on the payload dict, never on value non-nullness. Keys with
    no full-row op ever (orphan patches) or whose winning full-row op
    is a delete are dropped — mirrors cdc/table.py _fold_resolve."""
    flat = ("role", "text", "tool", "ts", "tool_name", "tool_latency_ms")
    data = data.sort_values("lsn", kind="mergesort").drop_duplicates(
        subset=["conv_id", "turn_idx", "lsn"]
    )
    state: dict = {}
    for r in data.itertuples():
        key = (r.conv_id, int(r.turn_idx))
        if r.op == "update_partial":
            st = state.setdefault(key, {"_has_base": False, "_deleted": False})
            for k, v in json.loads(r.payload).items():
                # non-column keys are mask-ignored, like the engine's
                # array_intersect with the manifest's flat names
                if k in flat:
                    st[k] = canonical_text(v) if k == "text" else v
        else:
            p = json.loads(r.payload)
            tm = p.get("tool_meta") or {}
            state[key] = {
                "_has_base": True,
                "_deleted": r.op == "delete",
                "role": p.get("role"),
                "text": canonical_text(p.get("text")),
                "tool": p.get("tool"),
                "ts": p.get("ts"),
                "tool_name": tm.get("name"),
                "tool_latency_ms": tm.get("latency_ms"),
            }
    rows = [
        {
            "conv_id": cid,
            "turn_idx": tix,
            "role": st.get("role"),
            "text": st.get("text"),
            "tool": st.get("tool"),
            "ts": pd.Timestamp(st["ts"]) if st.get("ts") else None,
            "tool_name": st.get("tool_name"),
            "tool_latency_ms": st.get("tool_latency_ms"),
        }
        for (cid, tix), st in state.items()
        if st["_has_base"] and not st["_deleted"]
    ]
    out = pd.DataFrame(rows)
    if len(out):
        out["tool_latency_ms"] = out["tool_latency_ms"].astype("Int64")
        out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return out


def write_wal_chunks(log: pd.DataFrame, wal_dir: str, n_chunks: int) -> list[str]:
    """Split the stream-ordered log into sequential parquet chunk files
    (one file ≈ one offset range) for the file-based WAL source."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(wal_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, len(log), n_chunks + 1).astype(int)
    base = int(__import__("time").time()) - n_chunks - 10
    for i in range(n_chunks):
        chunk = log.iloc[bounds[i] : bounds[i + 1]].copy()
        if chunk.empty:
            continue
        # Spark TIMESTAMP_NTZ reads parquet timestamp[us]; pandas default
        # ns precision would surface as a raw INT64 mismatch.
        chunk["ts"] = chunk["ts"].astype("datetime64[us]")
        path = os.path.join(wal_dir, f"chunk-{i:05d}.parquet")
        tbl = pa.Table.from_pandas(chunk, preserve_index=False)
        pq.write_table(tbl, path)
        # strictly increasing mtimes: the file stream source orders by
        # modification time, and the WAL contract requires DDL events
        # to be delivered before the data that needs them.
        os.utime(path, (base + i, base + i))
        paths.append(path)
    return paths
