"""Snapshot-committed, bucket-partitioned, MERGE-ON-READ table — the
Iceberg-shaped sink for the CDC engine.

No Iceberg runtime jar ships in this sandbox, so this implements the
same *semantics* on plain parquet + a JSON manifest with an atomic
pointer swap:

- data files:   ``root/data/f-<snapshot>-<n>.parquet`` (immutable)
- manifests:    ``root/_manifests/v{N}.json`` — schema, properties
  (committed batch ids, per-source-part LSN watermarks), capped
  lineage log, parent version, and the commit's FILE DELTA vs its
  parent (Iceberg manifest-file analog) with a periodic inline full
  rollup (manifest-list analog) — commit metadata is O(batch), not
  O(live-files); see the notes above ``Manifest``
- pointer:      ``root/_current`` — the committed version number,
  swapped with ``os.replace`` (atomic on POSIX), written AFTER the
  manifest: a crash between the two leaves an orphan manifest and a
  readable previous snapshot (write-manifest-last protocol,
  SURVEY.md §7.4)

**Merge-on-read**: each apply APPENDS per-bucket delta files of batch
winners (including tombstones); it never rewrites existing data. A key
may therefore appear in several files of its bucket — ``read()``
resolves last-writer-wins (max ``_lsn`` per key) at read time, and
``compact_buckets`` folds a bucket's files back to one resolved file
when the file count crosses a threshold. This is the Iceberg MoR /
Hudi MOR / Paimon LSM-bucket design, and it is what makes apply cost
O(batch) instead of O(table) — the difference between a CDC sink that
sustains 10^10 events and one whose batches slow down as the table
grows (copy-on-write rewrite amplification).

Readers resolve ``_current`` -> manifest -> exact file list, so
uncommitted data files are invisible. Bucket partitioning is
``pmod(xxhash64(conv_id), n_buckets)`` — the Iceberg
``bucket(N, conv_id)`` transform analog — so a key's full history
lives in one bucket (read-side LWW never crosses buckets) and
compaction / reads parallelize across buckets. On a real cluster this
module is replaced by Iceberg MERGE in merge-on-read mode + snapshot
summary properties; the engine API is identical (this is a sink swap,
not an engine change).

Reference parity: the reference persists each cube step as
Hive-partitioned parquet + temp table (ETLProcess.scala:111-128) with
``coalesce(1)`` — we keep "persisted, partitioned, queryable-by-name"
and drop the single-file write (SURVEY.md §4.2).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from audience_behavior_semantic_etl_spark.cdc import schema as S


def bucket_expr(conv_col, n_buckets: int):
    """Iceberg-style bucket transform: pmod(xxhash64(key), N)."""
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int")


# File-level key-range statistics (Iceberg DataFile lower_bounds /
# upper_bounds analog). Collected DRIVER-side from parquet FOOTERS at
# adoption time — footer-only metadata reads, no data pages touched,
# which is exactly the cost model of an Iceberg writer reporting stats
# in its DataFile entries. Values longer than this are discarded rather
# than trusted: parquet implementations may truncate long binary
# min/max (making `key > max` pruning unsound); engine-generated
# conv_ids are far shorter, so real files always qualify, and a file
# with no usable stats is simply never pruned (correctness-safe
# default).
_STATS_MAX_LEN = 256


def _stats_admit(stat: list | None, key: str) -> bool:
    """May ``key`` live in a file with min/max ``stat``? Missing stats
    admit (never prune what we can't bound)."""
    return stat is None or (stat[0] <= key <= stat[1])


def _safe_dirname(s: str) -> str:
    """App ids become directory components (quarantine layout); replace
    anything path-hostile so an id like 'etl/prod' can't escape the
    _quarantine tree. When sanitization ALTERS the id, append a short
    stable hash of the raw id so distinct ids that sanitize identically
    (e.g. 'etl/prod' vs 'etl_prod') keep DISJOINT directories —
    otherwise overwrite-mode quarantine writes with overlapping batch
    ids would clobber each other across apps."""
    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in s) or "_"
    if safe != s:
        safe += "-" + hashlib.md5(s.encode("utf-8")).hexdigest()[:8]
    return safe


# ---------------------------------------------------------------------
# Manifest storage: per-commit DELTAS + periodic full rollups.
#
# Round-4's format serialized the FULL live-file map into every commit's
# JSON — O(live-files) metadata written per commit and parsed per read,
# the classic single-manifest ceiling Iceberg splits into manifest
# files + a manifest list. v{N}.json now stores:
#
#   - the commit's own file DELTA vs its parent (``files.added`` /
#     ``files.removed`` / ``files.stats_added`` / ``files.stats_removed``)
#     — O(batch), which is what an append costs in data too;
#   - every ROLLUP_EVERY commits (and on every create / rewrite /
#     rebucket, whose data cost is O(live) anyway) an inline FULL
#     snapshot (``files.full``) — the manifest-list rollup that bounds
#     reconstruction walks to ROLLUP_EVERY hops;
#   - schema + properties (watermarks, exactly-once ledger, tags, WAP,
#     physical-name maps) in full — all O(apps + parts + refs), never
#     O(files); ``file_stats`` is the one O(files) property and is
#     delta-encoded with the file lists, re-attached on read;
#   - the lineage audit log, capped at LINEAGE_CAP most-recent rows
#     (older rows age out of the carried log; the retained commit chain
#     itself — snapshots_df/history_df — is the full history surface).
#
# ``manifest()`` reconstructs the full state by walking parents to the
# nearest full base and caching the result per (root, version):
# manifests are write-once and version numbers never reused
# (_alloc_version), so the cache can never serve stale content.
# gc_orphans rewrites any KEPT delta manifest whose reconstruction
# parent is being dropped in place as FULL (same version/snapshot_id/
# delta summary — see the boundary-materialization block there) so
# reconstruction can never dangle. The atomic
# write-manifest-then-swing-pointer commit protocol is unchanged.
_STATE_CACHE: dict[tuple[str, int], tuple] = {}
_STATE_CACHE_LOCK = threading.Lock()
_STATE_CACHE_MAX = 512


def _cache_put(key: tuple[str, int], val: tuple) -> None:
    """EVERY state-cache insert goes through here: eviction + insert
    under one lock. Background compaction threads reconstruct state
    concurrently with the apply thread, and an unguarded two-thread
    eviction double-deletes (KeyError mid commit); insert sites that
    skipped eviction accounting (_write_manifest primes the cache once
    per commit) would grow the dict without bound over a soak-scale
    run's thousands of commits. Reads stay lock-free (GIL-atomic dict
    get; entries are immutable once inserted)."""
    with _STATE_CACHE_LOCK:
        if len(_STATE_CACHE) >= _STATE_CACHE_MAX:
            # drop an arbitrary half; entries rebuild from disk on demand
            for k in list(_STATE_CACHE)[: _STATE_CACHE_MAX // 2]:
                _STATE_CACHE.pop(k, None)
        _STATE_CACHE[key] = val
ROLLUP_EVERY = 32
LINEAGE_CAP = 256
# the delta contract for commits that touch no data file (DDL, tags,
# WAP registry): parent file state carries over verbatim
_META_ONLY: dict = {"added": {}, "stats_added": {}}


@dataclass
class Manifest:
    version: int
    snapshot_id: str
    parent: int | None
    columns: list[tuple[str, str]]  # (name, type_name)
    n_buckets: int
    buckets: dict[str, list[str]]  # bucket id (str) -> relative file paths
    properties: dict[str, Any] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)
    # this commit's OWN file delta (populated on read from the stored
    # delta section; None on legacy full-format manifests, where
    # consumers fall back to a structural parent diff)
    files_added: dict[str, list[str]] | None = None
    files_removed: list[str] | None = None

    def to_json(self) -> str:
        """LEGACY full-format serialization (every manifest() result is
        reconstructed-full, so this is lossless). Production writes go
        through _write_manifest's delta format; this survives for test
        fixtures that pin the legacy-format read fallback."""
        return json.dumps(
            {
                "version": self.version,
                "snapshot_id": self.snapshot_id,
                "parent": self.parent,
                "columns": self.columns,
                "n_buckets": self.n_buckets,
                "buckets": self.buckets,
                "properties": self.properties,
                "lineage": self.lineage,
            }
        )


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        columns: list[tuple[str, Any]] | None = None,
        n_buckets: int = 16,
    ) -> "SnapshotTable":
        cols = columns or S.TRANSCRIPTS_V1_FIELDS
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        m = Manifest(
            version=0,
            snapshot_id=uuid.uuid4().hex,
            parent=None,
            columns=[(n, S.type_to_name(dt)) for n, dt in cols],
            n_buckets=n_buckets,
            buckets={},
            properties={"watermarks": {}, "committed_batches": {}},
        )
        t = SnapshotTable(spark, root)
        t._write_manifest(m)
        return t

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_current"))

    def manifest(self, version: int | None = None, ref: str = "main") -> Manifest:
        """Current manifest, or a specific committed version (time
        travel — Iceberg snapshot-id reads; old data files stay on disk
        until a GC pass, so every committed version remains readable).
        ``ref`` selects which head to resolve when ``version`` is None:
        "main" (the `_current` pointer) or a named branch.

        The returned object carries the RECONSTRUCTED full file state
        (delta chain folded onto the nearest full base — cached, see
        module notes) as fresh mutable copies: callers mutate it freely
        without touching the cache."""
        if version is None:
            version = self._head_version(ref)
        d = self._manifest_dict(version)
        buckets, stats, _depth = self._state(version, d)
        files = d.get("files")
        if files is None:  # legacy full-format manifest
            props = dict(d["properties"])
            added, removed = None, None
        else:
            props = dict(d["properties"])
            if stats:
                # entry values SHARED with the cache (consumers index
                # or replace entries, never mutate one in place); the
                # dict itself is fresh so key-level mutation stays
                # caller-local
                props["file_stats"] = dict(stats)
            added = {b: list(fs) for b, fs in files.get("added", {}).items()}
            removed = list(files.get("removed", []))
        return Manifest(
            version=d["version"],
            snapshot_id=d["snapshot_id"],
            parent=d["parent"],
            columns=[tuple(c) for c in d["columns"]],
            n_buckets=d["n_buckets"],
            buckets={b: list(fs) for b, fs in buckets.items()},
            properties=props,
            lineage=list(d.get("lineage", [])),
            files_added=added,
            files_removed=removed,
        )

    def _manifest_dict(self, version: int) -> dict:
        with open(os.path.join(self.root, "_manifests", f"v{version}.json")) as f:
            return json.loads(f.read())

    def _state(
        self, version: int, d: dict | None = None
    ) -> tuple[dict[str, tuple], dict[str, tuple], int]:
        """(buckets, file_stats, delta_depth) of a version — the full
        file state folded from the delta chain, memoized per
        (root, version). Bucket lists are frozen tuples; stat entries are
        lists SHARED by convention (replaced, never mutated in place). depth = hops to the nearest full
        base (0 for full manifests), which bounds both reconstruction
        and the GC base-chain walk."""
        key = (self.root, version)
        hit = _STATE_CACHE.get(key)
        if hit is not None:
            return hit
        # walk DOWN the delta chain to the nearest cached or full base,
        # collecting the pending deltas; then fold them upward onto ONE
        # mutable copy of the base. Only the requested version is
        # cached — caching every intermediate hop would cost
        # O(live-files × depth) dict copies per cold read, and cold
        # reads overwhelmingly target chain heads.
        chain: list[dict] = []  # pending delta dicts, newest first
        base: tuple | None = None  # (buckets, stats, depth) to fold onto
        v: int | None = version
        dd = d
        while True:
            if dd is None:
                hit = _STATE_CACHE.get((self.root, v))
                if hit is not None:
                    base = hit
                    break
                dd = self._manifest_dict(v)
            files = dd.get("files")
            if files is None:  # legacy format: full buckets inline
                base = (
                    {b: tuple(fs) for b, fs in dd["buckets"].items()},
                    dict(dd["properties"].get("file_stats") or {}),
                    0,
                )
                break
            if files.get("full") is not None:
                full = files["full"]
                base = (
                    {b: tuple(fs) for b, fs in full["buckets"].items()},
                    dict(full.get("stats", {})),
                    0,
                )
                break
            chain.append(files)
            v = dd["parent"]
            dd = None
        pbuckets, pstats, pdepth = base
        if not chain:
            buckets, stats, depth = pbuckets, pstats, pdepth
        else:
            buckets = {b: list(fs) for b, fs in pbuckets.items()}
            stats = dict(pstats)
            for files in reversed(chain):  # oldest pending first
                removed = set(files.get("removed", []))
                if removed:  # defensive: deltas are written append-only
                    for b in list(buckets):
                        buckets[b] = [f for f in buckets[b] if f not in removed]
                    for k in removed:
                        stats.pop(k, None)
                for b, rels in files.get("added", {}).items():
                    buckets.setdefault(b, []).extend(rels)
                for k in files.get("stats_removed", []):
                    stats.pop(k, None)
                stats.update(files.get("stats_added", {}))
            buckets = {b: tuple(fs) for b, fs in buckets.items()}
            depth = pdepth + len(chain)
        val = (buckets, stats, depth)
        _cache_put(key, val)
        return val

    # ------------------------------------------------------------ refs
    #
    # Branch refs (the Iceberg branch analog): named MUTABLE pointers
    # into the manifest DAG. "main" is the `_current` pointer; branches
    # live in `_refs.json`, mutated atomically (write-tmp + rename)
    # under the same commit lock as every other head mutation. Each
    # branch commit chain carries its OWN properties (exactly-once
    # ledger, watermarks, schema) forward from its fork point, so a
    # stream applying onto a branch is isolated from main until
    # `fast_forward` publishes it — the Iceberg `spark.wap.branch`
    # audit-branch pattern, at multi-commit granularity (single-commit
    # gating is `stage_wap`).

    def _refs_file(self) -> str:
        return os.path.join(self.root, "_refs.json")

    def _read_refs(self) -> dict[str, int]:
        try:
            with open(self._refs_file()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _write_refs(self, refs: dict[str, int]) -> None:
        tmp = os.path.join(self.root, f"_refs.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(refs, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._refs_file())

    def _head_version(self, ref: str = "main") -> int:
        if ref == "main":
            with open(os.path.join(self.root, "_current")) as f:
                return int(f.read().strip())
        refs = self._read_refs()
        if ref not in refs:
            raise ValueError(f"no such branch {ref!r}")
        return refs[ref]

    def _set_head(self, ref: str, version: int) -> None:
        if ref == "main":
            tmp = os.path.join(self.root, f"_current.tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(version))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(self.root, "_current"))
            return
        refs = self._read_refs()
        refs[ref] = version
        self._write_refs(refs)

    def _alloc_version(self) -> int:
        """Next GLOBALLY unique version number: manifests from every
        ref chain share one `_manifests/` namespace, so version numbers
        are allocated table-wide, not per-chain — two branches can
        never write the same `v{N}.json`. A persisted high-water mark
        (`_version_seq`) keeps allocation MONOTONE even when rollback +
        GC deletes the highest-numbered manifests: a version number,
        once used, is never reissued — checkpointed consumers (CDF
        streams, incremental views) key progress on version numbers
        and silently skip a reused one. Call under the commit lock."""
        vs = self._retained_versions()
        hwm = -1
        try:
            with open(os.path.join(self.root, "_version_seq")) as f:
                hwm = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        nxt = max(vs[-1] if vs else -1, hwm) + 1
        tmp = os.path.join(self.root, f"_version_seq.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(nxt))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.root, "_version_seq"))
        return nxt

    def _write_manifest(
        self, m: Manifest, ref: str = "main", delta: dict | None = None
    ) -> None:
        """Write-manifest-last atomic commit; advances ``ref``'s head.
        Stamps the commit wall-clock (``committed_at``) — manifests are
        write-once, so the stamp is the commit time, and age-based
        retention (gc_orphans ``max_age_seconds``) reads it back.

        Serializes the commit as a DELTA vs its parent's reconstructed
        state (O(batch) metadata per append) unless the commit removes
        files (compaction / purge / rebucket — their data cost is
        O(live) anyway), is the create commit, or the delta chain hit
        ROLLUP_EVERY — those write an inline full snapshot that resets
        the reconstruction walk.

        ``delta`` is the HOT-PATH contract: an append-only caller that
        knows exactly what it changed passes
        ``{"added": {bucket: [paths]}, "stats_added": {path: [lo,hi]}}``
        (both may be empty for metadata-only commits) and the
        O(live-files) full-state diff is skipped entirely — per-commit
        metadata work is then O(batch). Callers whose change is not a
        pure append (rollback, rebucket, compaction, set_property on
        file_stats) pass None and pay the diff."""
        import time as _time

        m.properties["committed_at"] = _time.time()
        if len(m.lineage) > LINEAGE_CAP:
            m.lineage = m.lineage[-LINEAGE_CAP:]
        m_stats = m.properties.get("file_stats") or {}
        if m.parent is None:
            pdepth = -1
        else:
            pdepth = self._state(m.parent)[2]
        if delta is not None and m.parent is not None:
            added = {b: list(fs) for b, fs in delta.get("added", {}).items()}
            removed: list[str] = []
            stats_added = {k: list(v) for k, v in delta.get("stats_added", {}).items()}
            stats_removed: list[str] = []
        else:
            pbuckets, pstats, _ = (
                self._state(m.parent) if m.parent is not None else ({}, {}, -1)
            )
            added = {}
            removed = []
            for b, fs in m.buckets.items():
                pf = pbuckets.get(b, ())
                pfset = set(pf)
                add = [f for f in fs if f not in pfset]
                if add or b not in pbuckets:
                    added[b] = add
                fsset = set(fs)
                removed.extend(f for f in pf if f not in fsset)
            removed.extend(
                f for b, pf in pbuckets.items() if b not in m.buckets for f in pf
            )
            stats_added = {}
            for k, v in m_stats.items():
                pv = pstats.get(k)
                if pv is None or pv[0] != v[0] or pv[1] != v[1]:
                    stats_added[k] = list(v)
            stats_removed = [k for k in pstats if k not in m_stats]
        full = m.parent is None or bool(removed) or pdepth + 1 >= ROLLUP_EVERY
        d = {
            "version": m.version,
            "snapshot_id": m.snapshot_id,
            "parent": m.parent,
            "columns": [list(c) for c in m.columns],
            "n_buckets": m.n_buckets,
            "properties": {
                k: v for k, v in m.properties.items() if k != "file_stats"
            },
            "lineage": m.lineage,
            "files": {
                "added": added,
                "removed": removed,
                "stats_added": stats_added,
                "stats_removed": stats_removed,
                "full": (
                    {"buckets": m.buckets, "stats": m_stats} if full else None
                ),
            },
        }
        mpath = os.path.join(self.root, "_manifests", f"v{m.version}.json")
        with open(mpath, "w") as f:
            f.write(json.dumps(d))
            f.flush()
            os.fsync(f.fileno())
        if delta is not None and m.parent is not None and not full:
            # hot path: derive the cached state from the parent's frozen
            # state + the delta — unchanged bucket tuples are SHARED
            # across versions, so caching a commit is O(batch), too
            pb, ps, _ = self._state(m.parent)
            nb = dict(pb)
            for b, fs in added.items():
                nb[b] = nb.get(b, ()) + tuple(fs)
            ns = dict(ps)
            ns.update(stats_added)
            _cache_put((self.root, m.version), (nb, ns, pdepth + 1))
        else:
            _cache_put(
                (self.root, m.version),
                (
                    {b: tuple(fs) for b, fs in m.buckets.items()},
                    {k: list(v) for k, v in m_stats.items()},
                    0 if full else pdepth + 1,
                ),
            )
        self._set_head(ref, m.version)

    # ------------------------------------------------------------ schema

    def spark_schema(self, with_lsn: bool = True, with_deleted: bool = False):
        m = self.manifest()
        cols = [(n, S.type_from_name(t)) for n, t in m.columns]
        return S.transcripts_schema(cols, with_lsn=with_lsn, with_deleted=with_deleted)

    # -- logical/physical column mapping (name-based field-id analog) --
    #
    # RENAME and DROP evolution need what Iceberg gets from field ids:
    # the STORED column name must be stable across renames, and a
    # re-added name must be a FRESH field that cannot read old data.
    # The manifest keeps three properties (all absent on tables that
    # never rename/drop — fully backward compatible):
    #   physical_names: {logical -> physical} for columns whose stored
    #     name differs from the current logical name (rename keeps the
    #     physical name; re-add after drop assigns "<name>__f<version>")
    #   used_physical:  every physical name ever assigned — consulted
    #     at add time so a re-added name gets a fresh physical column
    #     and old file data can never resurface
    #   rename_history: {logical -> [former logical names]} — the
    #     normalizer coalesces payload fields under any former name
    #     into the current column, so pre-rename events (in-flight or
    #     re-delivered) land identically (re-delivery determinism)
    # Readers alias physical -> that snapshot's logical names at the
    # scan (_read_rel_files); writers project logical -> physical at
    # the staged write (to_physical). Set-masks and patched_columns
    # store PHYSICAL names: they survive renames and are era-unique,
    # so a patch on a dropped-then-re-added column can never leak into
    # the new field (_fold_resolve translates per current manifest).

    def _phys_map(self, m: Manifest | None = None) -> dict[str, str]:
        """Current logical -> physical (stored) column name, identity
        where no rename/re-add ever diverged them."""
        m = m or self.manifest()
        p = m.properties.get("physical_names") or {}
        return {n: p.get(n, n) for n, _ in m.columns}

    def rename_history(self, m: Manifest | None = None) -> dict[str, list[str]]:
        """logical column -> former logical names (payload aliases)."""
        m = m or self.manifest()
        return {k: list(v) for k, v in (m.properties.get("rename_history") or {}).items()}

    def to_physical(self, df: DataFrame, m: Manifest | None = None) -> DataFrame:
        """Project a logical-named frame to stored (physical) column
        names for a staged write. No-op (no extra Project node) on
        tables that never renamed/re-added."""
        m = m or self.manifest()
        pm = self._phys_map(m)
        if all(l == p for l, p in pm.items()):
            return df
        return df.select(
            *[
                F.col(f.name).alias(pm[f.name]) if pm.get(f.name, f.name) != f.name
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )

    def rename_columns(self, mapping: dict[str, str], ref: str = "main") -> None:
        """RENAME COLUMN(s) ``{old: new}`` — metadata-only commit,
        Iceberg-style: no data file is touched; the stored name stays
        frozen and the manifest re-maps logical -> physical. Old
        snapshots time-travel under their own names. The former name
        joins ``rename_history`` so payloads still carrying it keep
        landing in the renamed column. Key columns (conv_id, turn_idx)
        are not renamable — the engine keys on them physically
        (bucket transform, file stats, merge keys)."""
        def run() -> None:
            m = self.manifest(ref=ref)
            names = {n for n, _ in m.columns}
            reserved = {S.LSN_META_COL, S.DELETED_META_COL, S.SETMASK_META_COL}
            if len(set(mapping.values())) != len(mapping):
                raise ValueError("rename_columns: duplicate target names")
            for old, new in mapping.items():
                if old in ("conv_id", "turn_idx"):
                    raise ValueError(f"rename_columns: cannot rename key column {old!r}")
                if old not in names:
                    raise ValueError(f"rename_columns: no such column {old!r}")
                # the target may be a name simultaneously renamed AWAY
                # (swap semantics); anything else that exists collides
                if new in (names - set(mapping)) or new in reserved:
                    raise ValueError(f"rename_columns: target name {new!r} collides")
            pm = self._phys_map(m)
            phys_names = dict(m.properties.get("physical_names") or {})
            hist = {k: list(v) for k, v in (m.properties.get("rename_history") or {}).items()}
            # two passes so a simultaneous swap can't pop an entry the
            # other rename just wrote
            for n in mapping:
                phys_names.pop(n, None)
            old_hist = {n: hist.pop(n, []) for n in mapping}
            cols: list[tuple[str, str]] = []
            for n, t in m.columns:
                if n not in mapping:
                    cols.append((n, t))
                    continue
                new = mapping[n]
                if pm[n] != new:
                    phys_names[new] = pm[n]
                hist[new] = [x for x in (old_hist[n] + [n]) if x != new]
                cols.append((new, t))
            # a rename target claims its name exclusively: strip it from
            # every OTHER column's alias list so one payload key can't
            # feed two columns
            targets = set(mapping.values())
            for k in list(hist):
                if k not in targets:
                    hist[k] = [x for x in hist[k] if x not in targets]
                if not hist[k]:
                    del hist[k]
            m.columns = cols
            if phys_names:
                m.properties["physical_names"] = phys_names
            else:
                m.properties.pop("physical_names", None)
            if hist:
                m.properties["rename_history"] = hist
            else:
                m.properties.pop("rename_history", None)
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            self._write_manifest(m, ref=ref, delta=_META_ONLY)

        self._with_commit_lock(run)

    def drop_columns(self, names: list[str], ref: str = "main") -> None:
        """DROP COLUMN(s) — metadata-only commit: data files are
        untouched, old snapshots still read the column (time travel),
        and the physical name is retired forever (``used_physical``) so
        re-adding the same name creates a FRESH field whose reads can
        never resurface old file data — the Iceberg field-id
        non-resurrection rule, in name form."""
        def run() -> None:
            m = self.manifest(ref=ref)
            have = {n for n, _ in m.columns}
            missing = set(names) - have
            if missing:
                raise ValueError(f"drop_columns: no such column(s) {sorted(missing)}")
            if {"conv_id", "turn_idx"} & set(names):
                raise ValueError("drop_columns: cannot drop key columns conv_id/turn_idx")
            pm = self._phys_map(m)
            used = set(m.properties.get("used_physical") or []) | set(pm.values())
            dropped_phys = {pm[n] for n in names}
            phys_names = {
                k: v for k, v in (m.properties.get("physical_names") or {}).items()
                if k not in names
            }
            hist = {
                k: list(v) for k, v in (m.properties.get("rename_history") or {}).items()
                if k not in names
            }
            patched = m.properties.get("patched_columns")
            if patched is not None:
                m.properties["patched_columns"] = sorted(set(patched) - dropped_phys)
            m.columns = [(n, t) for n, t in m.columns if n not in names]
            m.properties["used_physical"] = sorted(used)
            if phys_names:
                m.properties["physical_names"] = phys_names
            else:
                m.properties.pop("physical_names", None)
            if hist:
                m.properties["rename_history"] = hist
            else:
                m.properties.pop("rename_history", None)
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            self._write_manifest(m, ref=ref, delta=_META_ONLY)

        self._with_commit_lock(run)

    def add_columns(self, new_cols: dict[str, str], ref: str = "main") -> None:
        """ADD COLUMN(s): metadata-only commit; existing files are read
        with the widened schema (missing columns -> null), same as
        Iceberg schema evolution. A name whose physical column was ever
        used before (dropped column, or the frozen storage name of a
        since-renamed column) gets a FRESH physical name
        ``<name>__f<version>`` so old file data cannot resurface."""
        def run() -> None:
            m = self.manifest(ref=ref)
            existing = {n for n, _ in m.columns}
            added = [(n, t) for n, t in new_cols.items() if n not in existing]
            if not added:
                return
            pm = self._phys_map(m)
            used = set(m.properties.get("used_physical") or []) | set(pm.values())
            phys_names = dict(m.properties.get("physical_names") or {})
            hist = {k: list(v) for k, v in (m.properties.get("rename_history") or {}).items()}
            # allocate the commit version BEFORE minting fresh physical
            # names: versions are globally unique across ref chains, so
            # the __f<N> suffix is table-globally unique by construction
            # (two refs forked at the same parent re-adding the same
            # name can never mint the same physical column), and the
            # suffix always matches the committed version
            newv = self._alloc_version()
            for n, _t in added:
                phys = n if n not in used else f"{n}__f{newv}"
                if phys != n:
                    phys_names[n] = phys
                used.add(phys)
                # a re-added name is a FRESH field: it owns its payload key
                # and inherits no alias history
                hist.pop(n, None)
                for k in list(hist):
                    hist[k] = [x for x in hist[k] if x != n]
                    if not hist[k]:
                        del hist[k]
            m.columns = m.columns + added
            m.properties["used_physical"] = sorted(used)
            if phys_names:
                m.properties["physical_names"] = phys_names
            if hist:
                m.properties["rename_history"] = hist
            else:
                m.properties.pop("rename_history", None)
            m.parent = m.version
            m.version = newv
            m.snapshot_id = uuid.uuid4().hex
            self._write_manifest(m, ref=ref, delta=_META_ONLY)

        self._with_commit_lock(run)

    # physically safe type promotions: the parquet scan upcasts these
    # natively (int32 pages read under a bigint read schema, float under
    # double — probed on this Spark build, pinned by
    # test_widen_columns_* in tests/test_cdc.py), so widening is a
    # METADATA-ONLY commit and existing delta files never rewrite —
    # Iceberg's type-promotion evolution rule.
    SAFE_WIDENINGS = {("int", "long"), ("float", "double")}

    def widen_columns(self, changes: dict[str, str], ref: str = "main") -> None:
        """WIDEN COLUMN type(s), e.g. ``{"tool_latency_ms": "long"}``
        on an int column. Refuses anything but the safe promotions
        above — a lossy or non-upcastable change would corrupt reads of
        files already on disk."""
        def run() -> None:
            m = self.manifest(ref=ref)
            names = {n for n, _ in m.columns}
            unknown = set(changes) - names
            if unknown:
                raise ValueError(f"widen_columns: no such column(s) {sorted(unknown)}")
            out: list[tuple[str, str]] = []
            changed = False
            for n, t in m.columns:
                want = changes.get(n)
                if want is None or want == t:
                    out.append((n, t))
                    continue
                if (t, want) not in self.SAFE_WIDENINGS:
                    raise ValueError(
                        f"widen_columns: unsafe promotion {n}: {t} -> {want}; "
                        f"allowed: {sorted(self.SAFE_WIDENINGS)}"
                    )
                out.append((n, want))
                changed = True
            if not changed:
                return
            m.columns = out
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            self._write_manifest(m, ref=ref, delta=_META_ONLY)

        self._with_commit_lock(run)

    # ------------------------------------------------------------ read

    def read_raw(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        ref: str = "main",
    ) -> DataFrame:
        """Every stored row version (delta files unresolved) with both
        metadata columns — maintenance/compaction input. ``version``
        time-travels to an older committed snapshot; ``ref`` reads a
        branch head instead of main."""
        if version is None:
            version = self._head_version(ref)
        m = self.manifest(version)
        sel = (
            m.buckets
            if buckets is None
            else {str(b): m.buckets.get(str(b), []) for b in buckets}
        )
        return self._read_rel_files(m, [p for ps in sel.values() for p in ps])

    def _read_rel_files(self, m: Manifest, rels: list[str]) -> DataFrame:
        """Raw scan of an explicit manifest-relative file list under the
        manifest's (evolved) schema — the shared tail of read_raw and
        the stats-pruned read_key path."""
        cols = [(n, S.type_from_name(t)) for n, t in m.columns]
        # _set rides every raw read; files written before the mask
        # existed (or by compaction collapse) simply read it as NULL —
        # i.e. every row version is a full-row base, which is exactly
        # what they are.
        schema = S.transcripts_schema(
            cols, with_lsn=True, with_deleted=True, with_setmask=True
        )
        if not rels:
            return self.spark.createDataFrame([], schema)
        pm = self._phys_map(m)
        paths = [os.path.join(self.root, p) for p in rels]
        if all(l == p for l, p in pm.items()):
            return self.spark.read.schema(schema).parquet(*paths)
        # renamed/re-added columns: scan under the stored (physical)
        # names of THIS manifest's era, alias back to logical — a
        # metadata-only Project, pushed into the scan by Catalyst
        phys_schema = S.transcripts_schema(
            [(pm[n], dt) for n, dt in cols],
            with_lsn=True, with_deleted=True, with_setmask=True,
        )
        return self.spark.read.schema(phys_schema).parquet(*paths).select(
            *[F.col(pm[n]).alias(n) for n, _ in cols],
            F.col(S.LSN_META_COL),
            F.col(S.DELETED_META_COL),
            F.col(S.SETMASK_META_COL),
        )

    def read(
        self,
        buckets: list[int] | None = None,
        with_deleted: bool = False,
        version: int | None = None,
        ref: str = "main",
    ) -> DataFrame:
        """Merge-on-read resolution: one row per (conv_id, turn_idx).
        Row mode (default): the max-``_lsn`` version across all delta
        files (ties are re-delivered identical rows; any survivor is
        the same row). Column mode (sticky, once the table has seen a
        partial update — ``has_partial`` property): fold patch
        set-masks onto the latest full-row base (``_fold_resolve``).
        Both modes collapse to full rows; ``_set`` never leaks out.
        Tombstones are kept (flag surfaced when ``with_deleted``) so
        callers see deletions; ``read_final`` filters them."""
        if version is None:
            version = self._head_version(ref)
        m = self.manifest(version)
        df = self.read_raw(buckets, version=version)
        if m.properties.get("has_partial"):
            resolved = self._fold_resolve(df, m)
        else:
            w = Window.partitionBy("conv_id", "turn_idx").orderBy(
                F.col(S.LSN_META_COL).desc()
            )
            resolved = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", S.SETMASK_META_COL)
            )
        if with_deleted:
            return resolved
        return resolved.drop(S.DELETED_META_COL)

    def read_final(
        self, version: int | None = None, tag: str | None = None, ref: str = "main"
    ) -> DataFrame:
        """User-facing view: LWW-resolved, tombstones filtered,
        metadata columns dropped. ``version`` time-travels; ``tag``
        resolves a named pin (create_tag) to its version; ``ref``
        reads a branch head."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version or tag, not both")
            version = self.resolve_tag(tag)
        if version is None:
            version = self._head_version(ref)
        df = self.read(with_deleted=True, version=version)
        return df.filter(~F.coalesce(F.col(S.DELETED_META_COL), F.lit(False))).drop(
            S.LSN_META_COL, S.DELETED_META_COL
        )

    def read_key(self, conv_id: str, version: int | None = None) -> DataFrame:
        """Point lookup: the live turns of ONE conversation, touching
        only the files that can CONTAIN it. Two pruning levels, both
        manifest-resident and applied driver-side to the literal key:

        1. bucket transform — the Iceberg bucket-partition-pruning
           story: the scan is O(one bucket), not O(table);
        2. per-file conv_id min/max ranges (``file_stats`` property,
           the Iceberg DataFile lower/upper-bounds analog) — delta
           files are written sorted by conv_id, and the transcript
           workload creates conversations over time, so a bucket's
           accumulated delta generations have tight, mostly-disjoint
           key ranges; a recent-key lookup skips old generations
           entirely. At 100 TB a bucket holds thousands of files and
           this is the difference between O(bucket) and O(files
           actually holding the key).

        Files with no recorded stats (pre-stats tables, foreign
        writers) are always read — pruning is never unsound."""
        m = self.manifest(version)
        b = (
            self.spark.range(1)
            .select(bucket_expr(F.lit(conv_id), m.n_buckets).alias("b"))
            .collect()[0]["b"]
        )
        stats = m.properties.get("file_stats") or {}
        rels = [
            r
            for r in m.buckets.get(str(int(b)), [])
            if _stats_admit(stats.get(r), conv_id)
        ]
        raw = self._read_rel_files(m, rels).where(F.col("conv_id") == conv_id)
        return self._resolve_final(raw, m)

    def _resolve_final(self, raw: DataFrame, m: Manifest | None = None) -> DataFrame:
        """LWW/fold + tombstone-filter + meta-drop over an already-scoped
        raw frame (shared by read_final-style views)."""
        m = m or self.manifest()
        if m.properties.get("has_partial"):
            resolved = self._fold_resolve(raw, m)
        else:
            w = Window.partitionBy("conv_id", "turn_idx").orderBy(
                F.col(S.LSN_META_COL).desc()
            )
            resolved = (
                raw.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", S.SETMASK_META_COL)
            )
        return resolved.filter(
            ~F.coalesce(F.col(S.DELETED_META_COL), F.lit(False))
        ).drop(S.LSN_META_COL, S.DELETED_META_COL)

    def _fold_resolve(self, raw: DataFrame, m: Manifest) -> DataFrame:
        """COLUMN-level resolution for tables with partial updates
        (sparse after-images, the Hudi/Paimon partial-update merge
        analog): per key, each column's value comes from the highest-LSN
        version that SET it — full-row versions (``_set`` NULL: insert /
        update / delete tombstones) are *bases* that set every column,
        patches set exactly their mask. Because every base enters every
        column's candidate set, a patch below the latest base loses and
        a newer base resets the row — no explicit base_lsn pass is
        needed, ONE aggregate resolves everything (scale: same single
        shuffle as the row path; struct-max buffers force SortAggregate
        rather than hash — max_by compiles identically — but max() of
        (lsn, value) structs is associative, so the map-side PARTIAL
        aggregate still pre-reduces to one row per key per partition
        before the exchange, which the window path cannot do; plan
        pinned by test_partial_fold_resolve_single_shuffle_no_join).

        Output is a FULL row per key stamped ``_lsn = max(lsn)`` over
        all versions and ``_deleted`` from the winning base — a shape
        that is itself a valid base, which is why compaction can
        resolve-and-rewrite without destroying future patch semantics
        (a later patch overlays the collapsed row exactly as it would
        the original chain). Keys with no base ever (orphan patches —
        nothing to patch) are dropped, the read-side analog of "UPDATE
        matched zero rows". Deterministic: LSNs are unique per key;
        re-delivered duplicates tie with identical payloads.

        Cost scales with the PATCHED column set, not the table width:
        the manifest tracks which columns any patch has ever set
        (``patched_columns``, unioned per batch by apply_batch), and
        only those get a per-column struct-max; every never-patched
        column rides the single winning-base struct for free (its
        winner is by definition the latest base). On the bench table
        (8 columns, patches touching 3) this cut the fold read from
        ~1.9x to near the row-LWW path. Falls back to all-columns if
        the property is absent (pre-tracking tables)."""
        data_cols = [n for n, _ in m.columns if n not in ("conv_id", "turn_idx")]
        # masks and patched_columns store PHYSICAL names (stable across
        # renames, era-unique across drop/re-add) — translate per the
        # current manifest; identity on never-renamed tables
        pm = self._phys_map(m)
        patched_prop = m.properties.get("patched_columns")
        if patched_prop is None:
            patched = set(data_cols)
        else:
            pp = set(patched_prop)
            patched = {c for c in data_cols if pm[c] in pp}
        base_cols = [c for c in data_cols if c not in patched]
        is_base = F.col(S.SETMASK_META_COL).isNull()
        lsn = F.col(S.LSN_META_COL)
        aggs = [
            F.max(
                F.when(
                    is_base,
                    F.struct(
                        lsn.alias("l"),
                        F.coalesce(F.col(S.DELETED_META_COL), F.lit(False)).alias("d"),
                        *[F.col(c).alias(c) for c in base_cols],
                    ),
                )
            ).alias("__base"),
            F.max(lsn).alias("__lsn"),
        ]
        for c in data_cols:
            if c not in patched:
                continue
            cand = is_base | F.array_contains(F.col(S.SETMASK_META_COL), F.lit(pm[c]))
            aggs.append(
                F.max(F.when(cand, F.struct(lsn.alias("l"), F.col(c).alias("v")))).alias(
                    f"__w_{c}"
                )
            )
        return (
            raw.groupBy("conv_id", "turn_idx")
            .agg(*aggs)
            .filter(F.col("__base").isNotNull())
            .select(
                "conv_id",
                "turn_idx",
                *[
                    (
                        F.col(f"__w_{c}").getField("v") if c in patched
                        else F.col("__base").getField(c)
                    ).alias(c)
                    for c in data_cols
                ],
                F.col("__lsn").alias(S.LSN_META_COL),
                F.col("__base").getField("d").alias(S.DELETED_META_COL),
            )
        )

    def read_changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental consumption (CDC-out): every row VERSION written
        by commits AFTER ``from_version`` up to ``to_version``/current —
        the files those snapshots appended, nothing else. Downstream
        consumers chain pipelines without rescanning the table
        (Iceberg incremental reads / Hudi incremental queries).
        Tombstones appear with ``_deleted = true`` so deletions
        propagate; ``_lsn`` orders multiple versions of a key.

        A commit that REWRITES files (compaction) carries no new row
        versions, and appends after it are relative to the rewritten
        base — an incremental window crossing one is ambiguous, so it
        is refused (detected STRUCTURALLY: the commit removed files
        from its parent) and the caller re-syncs with a full read —
        the standard Iceberg incremental-read limitation."""
        m_to = self.manifest(to_version)
        cur = m_to.version
        new_files: list[str] = []
        v = cur
        while v > from_version:
            man = self.manifest(v)
            if man.files_removed is not None:  # delta summary stored
                added_files: set[str] = {
                    f for fs in man.files_added.values() for f in fs
                }
                removed_files: set[str] = set(man.files_removed)
            else:  # legacy full-format manifest: structural parent diff
                parent = self.manifest(man.parent) if man.parent is not None else None
                prev_files = (
                    {f for fs in parent.buckets.values() for f in fs} if parent else set()
                )
                cur_files = {f for fs in man.buckets.values() for f in fs}
                added_files = cur_files - prev_files
                removed_files = prev_files - cur_files
            if removed_files:
                raise ValueError(
                    f"incremental window ({from_version}, {cur}] crosses a "
                    f"file-rewriting commit (compaction/purge) at v{v}; "
                    "re-sync with a full read"
                )
            new_files.extend(added_files)
            if man.parent is None:
                break
            v = man.parent
        # _set rides the changelog too: a downstream incremental
        # consumer of a partial-update table needs the masks to apply
        # patches with the same column-fold semantics. _read_rel_files
        # also handles physical->logical aliasing for renamed columns.
        return self._read_rel_files(m_to, sorted(set(new_files)))

    # ------------------------------------------------------------ write

    def is_batch_committed(self, app_id: str, batch_id: int, ref: str = "main") -> bool:
        committed = self.manifest(ref=ref).properties.get("committed_batches", {})
        return batch_id <= committed.get(app_id, -1)

    def quarantine_dir(self, batch_id: int, app_id: str = "default") -> str:
        """Dead-letter location for ``app_id``'s batch ``batch_id``
        poison rows (original envelope rows, replayable). App-scoped to
        mirror the per-app exactly-once commit ledger: two apps applying
        to the same table with overlapping batch ids must not overwrite
        each other's dead letters (apply_batch writes with
        mode('overwrite') for idempotent redelivery). Written by
        apply_batch in quarantine mode; outside the data/manifest
        lifecycle, so GC and compaction never touch it."""
        return os.path.join(
            self.root, "_quarantine", f"app={_safe_dirname(app_id)}", f"batch={batch_id}"
        )

    def read_quarantine(self) -> DataFrame:
        """All quarantined envelope rows across apps and batches (empty
        frame with the envelope schema when nothing was ever
        quarantined). Re-applying a fixed subset is just ``apply_batch``
        over this. Tolerates the pre-app-scoped layout
        (_quarantine/batch=N) for tables written by older versions."""
        base = os.path.join(self.root, "_quarantine")
        dirs: list[str] = []
        if os.path.isdir(base):
            for d in sorted(os.listdir(base)):
                p = os.path.join(base, d)
                if d.startswith("app="):
                    dirs.extend(os.path.join(p, b) for b in sorted(os.listdir(p)))
                else:  # legacy flat batch=N layout
                    dirs.append(p)
        if not dirs:
            return self.spark.createDataFrame([], S.ENVELOPE_SCHEMA)
        return self.spark.read.schema(S.ENVELOPE_SCHEMA).parquet(*dirs)

    def new_staging_dir(self) -> str:
        """A staging directory UNDER the table root: adopted files move
        with a same-filesystem rename (atomic, no copy) regardless of
        where the table lives."""
        d = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        os.makedirs(d, exist_ok=True)
        return d

    def _adopt_staged(self, staged_dir: str | None, buckets: list[int], snapshot: str) -> dict[str, list[str]]:
        """Move ``staged_dir/__bucket=N/*.parquet`` into data/ and return
        bucket -> new relative file paths."""
        out: dict[str, list[str]] = {}
        if staged_dir is None:
            return out
        for b in buckets:
            bdir = os.path.join(staged_dir, f"__bucket={b}")
            rels: list[str] = []
            if os.path.isdir(bdir):
                for i, fn in enumerate(sorted(os.listdir(bdir))):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"data/f-{snapshot}-{b}-{i}.parquet"
                    shutil.move(os.path.join(bdir, fn), os.path.join(self.root, rel))
                    rels.append(rel)
            out[str(b)] = rels
        shutil.rmtree(staged_dir, ignore_errors=True)
        return out

    def _collect_file_stats(self, rels: list[str]) -> dict[str, list[str]]:
        """Per-file [min, max] of ``conv_id`` read from the parquet
        FOOTERS of just-adopted files (row-group statistics unioned per
        file). Footer-only: no data pages are read, so the cost per
        commit is O(new files) metadata fetches — the same work an
        Iceberg writer does to fill DataFile.lower_bounds/upper_bounds.
        Files whose stats are missing, non-string, or suspiciously long
        (possible writer-side truncation, which would make range
        pruning unsound) are omitted — readers treat a missing entry as
        "may contain anything"."""
        try:
            import pyarrow.parquet as pq
        except Exception:  # pragma: no cover - pyarrow ships in-sandbox
            return {}
        out: dict[str, list[str]] = {}
        for rel in rels:
            try:
                md = pq.ParquetFile(os.path.join(self.root, rel)).metadata
                idx = next(
                    i
                    for i in range(md.num_columns)
                    if md.schema.column(i).name == "conv_id"
                )
                mins: list[str] = []
                maxs: list[str] = []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError("row group without min/max")
                    lo, hi = st.min, st.max
                    if not (isinstance(lo, str) and isinstance(hi, str)):
                        raise ValueError("non-string conv_id stats")
                    if len(lo) > _STATS_MAX_LEN or len(hi) > _STATS_MAX_LEN:
                        raise ValueError("stats too long to trust")
                    mins.append(lo)
                    maxs.append(hi)
                if mins:
                    out[rel] = [min(mins), max(maxs)]
            except Exception:
                continue
        return out

    def _with_commit_lock(self, fn, timeout: float = 120.0):
        """Serialize the commit critical section across THREADS AND
        PROCESSES with an O_EXCL lockfile — the local-FS analog of the
        catalog's atomic compare-and-swap that Iceberg commits ride.
        Everything expensive (staging writes, file adoption moves) stays
        OUTSIDE the lock; only read-manifest → mutate → write-pointer is
        inside, so the lock is held for milliseconds."""
        import time as _time

        lock = os.path.join(self.root, "_commit.lock")
        t0 = _time.time()
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if _time.time() - t0 > timeout:
                    raise TimeoutError(f"commit lock {lock} held > {timeout}s")
                _time.sleep(0.02)
        try:
            return fn()
        finally:
            os.close(fd)
            os.remove(lock)

    def commit_append_deltas(
        self,
        staged_dir: str | None,
        affected_buckets: list[int],
        app_id: str,
        batch_id: int,
        watermarks: dict[str, int],
        lineage_row: dict[str, Any],
        ref: str = "main",
    ) -> str:
        """Merge-on-read apply commit: APPEND the staged files to each
        affected bucket's file list (no rewrite of existing data), then
        commit one new snapshot carrying the batch id + offset
        watermarks. Returns the new snapshot id. An append commutes
        with any concurrent commit (it only adds files), so under the
        optimistic protocol it is re-applied verbatim to the fresh
        manifest inside the lock."""
        adoption = uuid.uuid4().hex
        adopted = self._adopt_staged(staged_dir, affected_buckets, adoption)
        stats = self._collect_file_stats([r for rs in adopted.values() for r in rs])

        def mutate(m: Manifest) -> None:
            for b, rels in adopted.items():
                m.buckets[b] = list(m.buckets.get(b, [])) + rels
            m.properties.setdefault("file_stats", {}).update(stats)

        return self._commit(
            mutate, app_id, batch_id, watermarks, lineage_row, ref=ref,
            delta={"added": adopted, "stats_added": stats},
        )

    def commit_merged_buckets(
        self,
        staged_dir: str | None,
        affected_buckets: list[int],
        app_id: str,
        batch_id: int,
        watermarks: dict[str, int],
        lineage_row: dict[str, Any],
        base_buckets: dict[str, list[str]] | None = None,
        ref: str = "main",
    ) -> str:
        """Compaction-style commit: REPLACE each affected bucket's file
        list with the staged (resolved) files. Returns the snapshot id.

        Concurrency (the Iceberg rewrite-vs-append conflict rule):
        ``base_buckets`` is the file set the compaction READ. Inside the
        commit lock, any file appended to the bucket since that base —
        by an apply that committed while compaction ran — is RETAINED on
        top of the staged files; a blind swap would silently drop those
        rows. Read-side LWW makes the union correct (newer deltas simply
        win the merge window again)."""
        adoption = uuid.uuid4().hex
        adopted = self._adopt_staged(staged_dir, affected_buckets, adoption)
        base = base_buckets or {}
        stats = self._collect_file_stats([r for rs in adopted.values() for r in rs])

        def mutate(m: Manifest) -> None:
            for b, rels in adopted.items():
                known = set(base.get(b, m.buckets.get(b, [])))
                appended_since = [f for f in m.buckets.get(b, []) if f not in known]
                m.buckets[b] = rels + appended_since
            m.properties.setdefault("file_stats", {}).update(stats)

        return self._commit(mutate, app_id, batch_id, watermarks, lineage_row, ref=ref)

    def set_property(self, key: str, value: Any, ref: str = "main") -> None:
        """Commit a single table-property mutation as its own manifest
        version (lock-serialized, data files untouched). Used for
        durable control-plane facts that must survive restarts — e.g.
        the bootstrap snapshot-LSN fence (`apply.bootstrap_snapshot`)."""

        def run() -> None:
            m = self.manifest(ref=ref)
            m.properties[key] = value
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            m.lineage.append(
                {"op": "set_property", "key": key, "snapshot_id": m.snapshot_id}
            )
            self._write_manifest(m, ref=ref)

        self._with_commit_lock(run)

    # ------------------------------------------------------------ tags

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a committed version under an immutable NAME (the Iceberg
        snapshot-tag analog): audit pins, reproducibility pins ("the
        table as training run X saw it"), rollback anchors. A tagged
        version is PROTECTED from retention — ``gc_orphans`` /
        ``startup_maintenance`` keep its manifest and data files alive
        regardless of ``keep_versions`` — so time travel to it works
        until ``drop_tag``. Tag names are single-assignment (re-tagging
        raises; drop first) because downstream consumers treat a tag as
        an immutable fact. Returns the pinned version."""

        def run() -> int:
            m = self.manifest()
            v = m.version if version is None else int(version)
            # the tagged manifest must actually be readable
            self.manifest(v)
            tags = m.properties.setdefault("tags", {})
            if name in tags:
                raise ValueError(
                    f"tag {name!r} already pins v{tags[name]}; drop_tag first"
                )
            tags[name] = v
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            m.lineage.append(
                {"op": "create_tag", "tag": name, "pinned_version": v,
                 "snapshot_id": m.snapshot_id}
            )
            self._write_manifest(m, delta=_META_ONLY)
            return v

        return self._with_commit_lock(run)

    def drop_tag(self, name: str) -> None:
        """Release a tag; its version re-enters normal retention and the
        next GC pass may expire it."""

        def run() -> None:
            m = self.manifest()
            tags = m.properties.get("tags", {})
            if name not in tags:
                raise ValueError(f"no such tag {name!r}")
            del tags[name]
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            m.lineage.append(
                {"op": "drop_tag", "tag": name, "snapshot_id": m.snapshot_id}
            )
            self._write_manifest(m, delta=_META_ONLY)

        self._with_commit_lock(run)

    def tags(self) -> dict[str, int]:
        return dict(self.manifest().properties.get("tags", {}))

    def resolve_tag(self, name: str) -> int:
        tags = self.manifest().properties.get("tags", {})
        if name not in tags:
            raise ValueError(f"no such tag {name!r}")
        return int(tags[name])

    # ------------------------------------------------------------ branches

    def create_branch(self, name: str, version: int | None = None) -> int:
        """Create a MUTABLE named ref at ``version`` (default: main's
        head). Commits made with ``ref=name`` advance the branch only;
        main never sees them until ``fast_forward``. The branch chain
        inherits the fork-point manifest wholesale — schema, watermarks
        and the exactly-once ledger — so a re-delivered batch that
        already landed on main no-ops on the branch too. Returns the
        fork version."""

        def run() -> int:
            if name == "main" or not name:
                raise ValueError(f"invalid branch name {name!r}")
            refs = self._read_refs()
            if name in refs:
                raise ValueError(f"branch {name!r} already exists at v{refs[name]}")
            v = self._head_version("main") if version is None else int(version)
            self.manifest(v)  # must be readable
            refs[name] = v
            self._write_refs(refs)
            return v

        return self._with_commit_lock(run)

    def drop_branch(self, name: str, force: bool = False) -> None:
        """Delete a branch ref; its commits become GC-able once they
        age out of every other ref's retention window. Refuses when the
        branch holds UNPUBLISHED commits (its head is not an ancestor
        of main — dropping would silently discard applied batches; the
        git ``-d`` vs ``-D`` distinction) unless ``force=True``."""

        def run() -> None:
            refs = self._read_refs()
            if name not in refs:
                raise ValueError(f"no such branch {name!r}")
            if not force:
                head = refs[name]
                main = self._head_version("main")
                if not self._is_ancestor(head, main):
                    raise ValueError(
                        f"branch {name!r} (v{head}) has unpublished commits; "
                        "fast_forward/cherry_pick first, or drop_branch(..., "
                        "force=True) to discard them"
                    )
            del refs[name]
            self._write_refs(refs)

        self._with_commit_lock(run)

    def branches(self) -> dict[str, int]:
        return self._read_refs()

    def _is_ancestor(self, ancestor: int, descendant: int) -> bool:
        """Walk ``descendant``'s parent chain looking for ``ancestor``.
        Metadata-only: one small JSON read per hop, bounded by the
        retention window (a pruned hop means the chain left the
        retained set — not an ancestor we can prove)."""
        v: int | None = descendant
        while v is not None:
            if v == ancestor:
                return True
            try:
                v = self._manifest_dict(v)["parent"]
            except FileNotFoundError:
                return False
        return False

    def fast_forward(self, ref: str, from_branch: str) -> int:
        """Fast-forward ``ref`` (usually "main") to ``from_branch``'s
        head — the Iceberg ``fast_forward`` publish step of the audit-
        branch pattern. STRICTLY fast-forward: ``ref``'s head must be
        an ancestor of the branch head, i.e. nothing was committed to
        ``ref`` since the fork (otherwise the move would silently drop
        those commits — that needs a merge/cherry-pick, which this
        engine does not do; the caller rebases by re-applying the
        branch's batches, which the per-app ledger makes idempotent).
        Pure pointer swing: no data file is touched, the branch's
        ledger/watermarks/schema become ``ref``'s atomically."""

        def run() -> int:
            target = self._head_version(from_branch)
            cur = self._head_version(ref)
            if cur == target:
                return target
            if not self._is_ancestor(cur, target):
                raise ValueError(
                    f"cannot fast-forward {ref!r} (v{cur}) to {from_branch!r} "
                    f"(v{target}): v{cur} is not an ancestor of v{target}"
                )
            self._set_head(ref, target)
            return target

        return self._with_commit_lock(run)

    @staticmethod
    def _single_batch_delta(
        op: str, version: int, src: Manifest, par: Manifest
    ) -> tuple[str, int]:
        """The (app_id, batch_id) a commit added to the exactly-once
        ledger vs its parent — cherry_pick/replay_commit only handle
        commits that landed exactly one batch (DDL and maintenance
        commits add none; merged/multi-app commits are ambiguous)."""
        src_ledger = src.properties.get("committed_batches", {})
        par_ledger = par.properties.get("committed_batches", {})
        app_delta = {a: b for a, b in src_ledger.items() if par_ledger.get(a) != b}
        if len(app_delta) != 1:
            raise ValueError(
                f"{op}: v{version} is not a single-batch apply commit "
                f"(ledger delta: {app_delta})"
            )
        ((app_id, batch_id),) = app_delta.items()
        return app_id, int(batch_id)

    def cherry_pick(self, version: int, ref: str = "main") -> str | None:
        """Re-apply ONE append-only commit (usually a branch commit)
        onto ``ref``'s head as a new commit — the Iceberg
        cherrypickSnapshot analog, and the escape hatch when
        ``fast_forward`` is refused because the target diverged: pick
        the branch's commits one by one instead of replaying them from
        source. Copies the commit's file ADDITIONS (no data rewrite —
        read-side LWW makes the union correct even when key ranges
        overlap), its file stats, and its exactly-once ledger +
        watermark DELTAS vs its parent, so the picked batch's
        re-delivery no-ops on ``ref`` exactly as if it had been applied
        there. Refuses rewrite commits (compaction/purge/rebucket) —
        their file lists are relative to a base the target may not
        share (the Iceberg limitation). Idempotent: picking a batch the
        target ledger already holds returns None without committing."""
        src = self.manifest(version)
        if src.parent is None:
            raise ValueError("cherry_pick: the create commit cannot be picked")
        par = self.manifest(src.parent)
        if src.files_removed is not None:  # delta summary stored
            if src.files_removed:
                raise ValueError(
                    f"cherry_pick: v{version} is a rewrite commit "
                    "(compaction/purge/rebucket); only append commits can be picked"
                )
            added_by_b = {b: list(fs) for b, fs in src.files_added.items() if fs}
        else:  # legacy full-format manifest: structural parent diff
            par_files = {f for fs in par.buckets.values() for f in fs}
            src_files = {f for fs in src.buckets.values() for f in fs}
            if par_files - src_files:
                raise ValueError(
                    f"cherry_pick: v{version} is a rewrite commit "
                    "(compaction/purge/rebucket); only append commits can be picked"
                )
            added_by_b = {
                b: [f for f in fs if f not in par_files]
                for b, fs in src.buckets.items()
            }
            added_by_b = {b: rels for b, rels in added_by_b.items() if rels}
        app_id, batch_id = self._single_batch_delta("cherry_pick", version, src, par)
        if self.is_batch_committed(app_id, int(batch_id), ref=ref):
            return None  # already on the target chain — fast-path no-op
        src_wm = src.properties.get("watermarks", {})
        par_wm = par.properties.get("watermarks", {})
        wm_delta = {p: int(l) for p, l in src_wm.items() if par_wm.get(p) != l}
        added_flat = {f for fs in added_by_b.values() for f in fs}
        stats = {
            f: v for f, v in (src.properties.get("file_stats") or {}).items()
            if f in added_flat
        }
        # schema-era facts of the SOURCE commit, compared against the
        # target head INSIDE the lock: a branch data commit written
        # after branch-side DDL carries columns / physical-name eras the
        # target cannot read correctly (an added column silently lost,
        # or post-drop rows folding as all-NULL bases) — and the commit
        # would mark the batch committed, so replay could never repair
        # it. Schema-diverged chains need replay-from-source, not a pick.
        src_schema = (
            list(src.columns),
            src.properties.get("physical_names") or {},
            sorted(src.properties.get("used_physical") or []),
        )

        class _Done(Exception):
            pass

        def mutate(m: Manifest) -> None:
            # re-check idempotence UNDER the commit lock: a concurrent
            # direct apply of the same (app_id, batch_id) between the
            # fast-path check above and this commit must no-op here,
            # not double-land the batch
            committed = m.properties.get("committed_batches", {})
            if int(batch_id) <= int(committed.get(app_id, -1)):
                raise _Done()
            tgt_schema = (
                list(m.columns),
                m.properties.get("physical_names") or {},
                sorted(m.properties.get("used_physical") or []),
            )
            if tgt_schema != src_schema:
                raise ValueError(
                    f"cherry_pick: v{version} was written under a different "
                    f"schema era than {ref!r}'s head (columns/physical-name "
                    "divergence); replay the batch from source instead"
                )
            for b, rels in added_by_b.items():
                have = set(m.buckets.get(b, []))
                m.buckets[b] = list(m.buckets.get(b, [])) + [
                    r for r in rels if r not in have
                ]
            if stats:
                m.properties.setdefault("file_stats", {}).update(stats)

        try:
            return self._commit(
                mutate,
                app_id,
                int(batch_id),
                wm_delta,
                {"op": "cherry_pick", "source_version": int(version),
                 "batch_id": int(batch_id)},
                ref=ref,
            )
        except _Done:
            return None  # concurrent apply landed it first — no-op

    def replay_commit(self, version: int, ref: str = "main", apply_cfg=None):
        """Re-APPLY one append commit's batch onto ``ref`` through the
        normal apply path — the escape hatch cherry_pick's schema-era
        guard points at ("replay the batch from source instead").
        Where cherry_pick copies FILES and therefore requires identical
        schema eras, replay re-derives the commit's row versions under
        the SOURCE commit's own era (``read_changes`` aliases
        physical -> that era's logical names at the scan),
        re-translates them to WAL envelopes (``cdf_to_envelope``, the
        replication kernel), and lands them through ``apply_batch``
        under the TARGET era — the normalizer's rename-history
        coalescing and column-set projection absorb the divergence:
        a column the target also has (under any name in its rename
        history) lands there; a column the target lacks folds away.

        Columns are matched across eras by PHYSICAL identity: a field
        the two refs call different names (the branch renamed it, the
        target didn't — or vice versa) is re-keyed to the TARGET's
        current logical name before the envelope is built, so its
        values land instead of folding away as an unknown payload key.
        A translation that would collide two batch columns onto one
        name (the target recycled a name the source era still uses) is
        refused — those chains need a full resync, not a replay.

        Exactly-once is preserved verbatim: the source commit's
        (app_id, batch_id) ledger delta is replayed as-is, so
        re-delivery of the ledger's CURRENT batch no-ops
        (``BatchMetrics.skipped``). A batch OLDER than the target
        ledger's high-water mark is refused rather than silently
        skipped: the ledger cannot distinguish "landed earlier" from
        "never landed", so replay a diverged chain's commits
        oldest-first. Rewrite commits are refused by ``read_changes``
        (their row set is relative to a base the target may not
        share); DDL/metadata commits carry no batch and are refused
        here. Returns the apply's ``BatchMetrics``."""
        import dataclasses

        from audience_behavior_semantic_etl_spark.cdc.apply import (
            ApplyConfig,
            apply_batch,
        )
        from audience_behavior_semantic_etl_spark.cdc.replicate import (
            cdf_to_envelope,
        )

        src = self.manifest(version)
        if src.parent is None:
            raise ValueError("replay_commit: the create commit cannot be replayed")
        par = self.manifest(src.parent)
        app_id, batch_id = self._single_batch_delta(
            "replay_commit", version, src, par
        )
        tgt = self.manifest(ref=ref)
        committed = int(tgt.properties.get("committed_batches", {}).get(app_id, -1))
        if batch_id < committed:
            raise ValueError(
                f"replay_commit: {app_id} batch {batch_id} is older than "
                f"{ref!r}'s ledger high-water mark {committed}; the ledger "
                "cannot tell whether it ever landed — replay commits "
                "oldest-first"
            )
        src_pm = self._phys_map(src)
        tgt_inv = {p: l for l, p in self._phys_map(tgt).items()}
        ren = {
            l: tgt_inv[p]
            for l, p in src_pm.items()
            if p in tgt_inv and tgt_inv[p] != l
        }
        rows = self.read_changes(src.parent, version)
        if ren:
            final = [ren.get(c, c) for c in rows.columns]
            if len(set(final)) != len(final):
                raise ValueError(
                    f"replay_commit: physical-identity translation {ren} "
                    "collides with another source-era column; the chains "
                    "need a full resync, not a replay"
                )
            rows = rows.select(
                *[F.col(c).alias(ren.get(c, c)) for c in rows.columns]
            )
        env = cdf_to_envelope(
            rows,
            {p: ren.get(l, l) for l, p in src_pm.items()},
            {ren.get(l, l): v for l, v in self.rename_history(src).items()},
        )
        cfg = dataclasses.replace(
            apply_cfg or ApplyConfig(), app_id=app_id, branch=ref
        )
        return apply_batch(env, self, int(batch_id), cfg)

    def rollback(self, version: int | None = None, tag: str | None = None,
                 ref: str = "main") -> int:
        """Roll ``ref`` back to an OLDER version of its own chain (the
        Iceberg rollback-to-snapshot analog): pure pointer swing to an
        ancestor — no data file is touched, the abandoned commits stay
        readable by explicit version until GC ages them out of every
        ref's retention. ``tag`` resolves a named pin. The target must
        be an ancestor of the current head (cross-chain or forward
        moves are not a rollback — use fast_forward for those).

        The exactly-once ledger rolls back WITH the manifest: batches
        committed after the target become un-committed, so a source
        replay re-applies them and the table converges again — exactly
        the recover-by-replay contract the north rule requires.

        Like Iceberg's rollback, this COMMITS A NEW manifest whose
        data state (columns, buckets, ledger, watermarks) is the
        target's, rather than swinging the pointer to the old file:
        registry-style properties that must outlive any rollback — the
        tag registry (create_tag's "protected until drop_tag"
        contract) and staged-WAP entries (their files stay
        GC-protected) — are carried over from the abandoned head. A
        bare pointer swing would silently revert both registries to
        their state at the target commit."""

        def run() -> int:
            v = version
            if tag is not None:
                if v is not None:
                    raise ValueError("pass version or tag, not both")
                v = self.resolve_tag(tag)
            if v is None:
                raise ValueError("rollback needs a version or tag")
            v = int(v)
            cur = self._head_version(ref)
            if v == cur:
                return v
            if not self._is_ancestor(v, cur):
                raise ValueError(
                    f"cannot roll {ref!r} back to v{v}: not an ancestor of "
                    f"the current head v{cur}"
                )
            head = self.manifest(cur)
            m = self.manifest(v)
            for registry in ("tags", "wap"):
                reg = head.properties.get(registry)
                if reg:
                    m.properties[registry] = reg
                else:
                    m.properties.pop(registry, None)
            m.parent = cur
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            m.lineage.append(
                {"op": "rollback", "restored_version": v,
                 "snapshot_id": m.snapshot_id, "parent_snapshot": head.snapshot_id}
            )
            self._write_manifest(m, ref=ref)
            return v

        return self._with_commit_lock(run)

    # ------------------------------------------------------------ WAP

    def stage_wap(
        self,
        wap_id: str,
        staged_dir: str | None,
        affected_buckets: list[int],
        app_id: str,
        batch_id: int,
        watermarks: dict[str, int],
        lineage_row: dict[str, Any],
    ) -> str:
        """WRITE-AUDIT-PUBLISH, stage phase (the Iceberg ``wap.id``
        staged-snapshot pattern): adopt the batch's delta files into
        data/ but record them under ``properties["wap"][wap_id]``
        instead of the bucket lists — INVISIBLE to every reader, ledger
        and watermarks NOT advanced. An auditor inspects the would-be
        state with ``read_wap``; ``publish_wap`` then merges the files
        and advances exactly-once state atomically, or ``reject_wap``
        discards them. Batch-level quality gating, complementing the
        row-level quarantine path.

        Re-staging an existing ``wap_id`` REPLACES it (the previous
        staged files become GC orphans): the id is derived from
        (app, batch), so stream re-delivery of a staged-but-unpublished
        batch is idempotent. Staged files are retention-protected
        (gc_orphans keeps every live WAP's files) until published or
        rejected."""
        adoption = uuid.uuid4().hex
        adopted = self._adopt_staged(staged_dir, affected_buckets, adoption)
        stats = self._collect_file_stats([r for rs in adopted.values() for r in rs])
        snapshot = uuid.uuid4().hex

        def run() -> str:
            m = self.manifest()
            waps = m.properties.setdefault("wap", {})
            waps[wap_id] = {
                "buckets": {b: rels for b, rels in adopted.items() if rels},
                "file_stats": stats,
                "app_id": app_id,
                "batch_id": batch_id,
                "watermarks": {str(k): int(v) for k, v in watermarks.items()},
                "lineage": lineage_row,
            }
            m.parent = m.version
            m.version = self._alloc_version()
            old = m.snapshot_id
            m.snapshot_id = snapshot
            m.lineage.append(
                {"op": "wap_stage", "wap_id": wap_id, "batch_id": batch_id,
                 "snapshot_id": snapshot, "parent_snapshot": old}
            )
            self._write_manifest(m, delta=_META_ONLY)
            return snapshot

        return self._with_commit_lock(run)

    def waps(self) -> dict[str, dict]:
        return dict(self.manifest().properties.get("wap", {}))

    def _wap_entry(self, wap_id: str) -> dict:
        w = self.manifest().properties.get("wap", {}).get(wap_id)
        if w is None:
            raise ValueError(f"no staged WAP {wap_id!r}")
        return w

    def read_wap(self, wap_id: str) -> DataFrame:
        """Audit view: the final state the table WOULD have if
        ``wap_id`` were published — current files plus the staged
        ones, fully resolved (LWW / column-fold, tombstones filtered).
        Reads only; publishes nothing."""
        m = self.manifest()
        w = self._wap_entry(wap_id)
        rels = [f for fs in m.buckets.values() for f in fs] + [
            f for fs in w["buckets"].values() for f in fs
        ]
        return self._resolve_final(self._read_rel_files(m, rels), m)

    def publish_wap(self, wap_id: str) -> str:
        """Atomically merge the staged files into the bucket lists AND
        advance the exactly-once ledger / watermarks — from this commit
        on, the batch is indistinguishable from a direct apply (same
        lineage fields, op-tagged), and its re-delivery no-ops."""
        w = self._wap_entry(wap_id)

        def mutate(m: Manifest) -> None:
            cur = m.properties.get("wap", {}).get(wap_id)
            if cur is None:
                raise ValueError(f"WAP {wap_id!r} vanished (already published/rejected?)")
            for b, rels in cur["buckets"].items():
                m.buckets[b] = list(m.buckets.get(b, [])) + rels
            m.properties.setdefault("file_stats", {}).update(cur.get("file_stats", {}))
            del m.properties["wap"][wap_id]

        return self._commit(
            mutate,
            w["app_id"],
            int(w["batch_id"]),
            {k: int(v) for k, v in w["watermarks"].items()},
            {**w["lineage"], "op": "wap_publish", "wap_id": wap_id},
        )

    def reject_wap(self, wap_id: str) -> None:
        """Discard a staged batch: the entry is dropped (its files
        become GC orphans), the ledger never advances — the auditor
        decided the batch must not land. Re-delivery of the same batch
        re-applies (and re-stages) it."""
        self._wap_entry(wap_id)

        def run() -> None:
            m = self.manifest()
            if wap_id not in m.properties.get("wap", {}):
                raise ValueError(f"WAP {wap_id!r} vanished (already published/rejected?)")
            del m.properties["wap"][wap_id]
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = uuid.uuid4().hex
            m.lineage.append(
                {"op": "wap_reject", "wap_id": wap_id, "snapshot_id": m.snapshot_id}
            )
            self._write_manifest(m, delta=_META_ONLY)

        self._with_commit_lock(run)

    def _commit(
        self,
        mutate,
        app_id: str,
        batch_id: int,
        watermarks: dict[str, int],
        lineage_row: dict[str, Any],
        ref: str = "main",
        delta: dict | None = None,
    ) -> str:
        """Optimistic snapshot commit: the manifest is re-read FRESH
        inside the commit lock and the caller's mutation re-applied to
        it, so concurrent committers (apply vs async compaction) never
        clobber each other's versions. ``delta`` is the append-only
        fast-path contract forwarded to _write_manifest (see there)."""
        snapshot = uuid.uuid4().hex

        def run() -> str:
            m = self.manifest(ref=ref)
            mutate(m)
            fs = m.properties.get("file_stats")
            if fs and delta is None:
                # stats live and die with the files they describe; a
                # rewriting commit (compaction/purge) drops the entries
                # of the files it removed. Old versions keep their own
                # copies — time travel prunes with era-correct stats.
                # Append-only (delta) commits remove nothing, so the
                # O(live-files) prune is skipped on the hot path.
                live = {f for fls in m.buckets.values() for f in fls}
                m.properties["file_stats"] = {k: v for k, v in fs.items() if k in live}
            m.parent = m.version
            m.version = self._alloc_version()
            old_snapshot = m.snapshot_id
            m.snapshot_id = snapshot
            wm = m.properties.setdefault("watermarks", {})
            for part, lsn in watermarks.items():
                wm[str(part)] = max(int(lsn), int(wm.get(str(part), -1)))
            # max, not assignment: a cherry-pick / publish racing a
            # direct apply must never regress a ledger the apply just
            # advanced (batch ids are per-app monotone by contract)
            cb = m.properties.setdefault("committed_batches", {})
            cb[app_id] = max(int(batch_id), int(cb.get(app_id, -1)))
            m.lineage.append(
                {**lineage_row, "snapshot_id": snapshot, "parent_snapshot": old_snapshot}
            )
            self._write_manifest(m, ref=ref, delta=delta)
            return snapshot

        return self._with_commit_lock(run)

    # ------------------------------------------------------------ maintenance

    def buckets_over_threshold(self, max_deltas: int) -> list[int]:
        """Buckets whose accumulated DELTA-SNAPSHOT count exceeds
        ``max_deltas`` — compaction candidates (manifest metadata only,
        no data read).

        Snapshots, not raw files: one batch may write a bucket as 2-3
        files when range boundaries split it across write tasks, and
        that multiplicity scales with shuffle parallelism — a file-count
        threshold would compact k× more often at k× executors for the
        SAME logical backlog. Read amplification of merge-on-read grows
        with the number of delta GENERATIONS a key may span (one per
        batch), which is exactly the snapshot count. File names embed
        the snapshot id (``f-<snapshot>-...``), so this is a pure
        manifest computation."""
        m = self.manifest()
        out = []
        for b, fs in m.buckets.items():
            snaps = {os.path.basename(f).split("-")[1] for f in fs}
            if len(snaps) > max_deltas:
                out.append(int(b))
        return out

    def compact_buckets(
        self,
        buckets: list[int],
        purge_tombstones_below_lsn: int | None = None,
        shuffle_partitions: int | None = None,
    ) -> str | None:
        """Fold each bucket's delta files into one LWW-resolved file set
        (the MoR compaction). Tombstones are RETAINED unless the caller
        supplies a re-delivery horizon — a tombstone with
        ``_lsn < horizon`` can never lose to a future event, so it can
        be dropped. The engine cannot infer the horizon from apply
        watermarks (a re-delivered duplicate carries its ORIGINAL lsn);
        it comes from the source's retention guarantee. Commits one new
        snapshot; returns its id (None if nothing to do).

        Obsolete pre-compaction files stay on disk, unreferenced by the
        new manifest (Iceberg-style orphans; time-travel readers of old
        snapshots still see them until a GC pass)."""
        if not buckets:
            return None
        m = self.manifest()
        # base file set AS READ — commit_merged_buckets retains any file
        # appended to these buckets by a commit that lands while this
        # compaction is running (rewrite-vs-append conflict rule)
        base = {str(b): list(m.buckets.get(str(b), [])) for b in buckets}
        resolved = self.read(buckets=buckets, with_deleted=True)
        if purge_tombstones_below_lsn is not None:
            resolved = resolved.filter(
                ~(
                    F.coalesce(F.col(S.DELETED_META_COL), F.lit(False))
                    & (F.col(S.LSN_META_COL) < F.lit(purge_tombstones_below_lsn))
                )
            )
        n = shuffle_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        staged = self.new_staging_dir()
        (
            self.to_physical(resolved, m)
            .withColumn("__bucket", bucket_expr(F.col("conv_id"), m.n_buckets))
            # range, not hash: few distinct bucket values hash-collide
            # into unbalanced tasks (see apply.py write path)
            .repartitionByRange(min(n, len(buckets)), "__bucket", "conv_id")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(staged)
        )
        return self.commit_merged_buckets(
            staged_dir=staged,
            affected_buckets=buckets,
            app_id="__maintenance__",
            batch_id=int(m.properties.get("committed_batches", {}).get("__maintenance__", -1)) + 1,
            watermarks={},
            lineage_row={
                "op": "compact",
                "buckets": len(buckets),
                "purge_below_lsn": purge_tombstones_below_lsn,
            },
            base_buckets=base,
        )

    def purge_tombstones(self, below_lsn: int, shuffle_partitions: int | None = None) -> str | None:
        """Compact ALL buckets, dropping tombstones below the supplied
        re-delivery horizon (see compact_buckets)."""
        m = self.manifest()
        buckets = [int(b) for b, fs in m.buckets.items() if fs]
        return self.compact_buckets(
            buckets, purge_tombstones_below_lsn=below_lsn, shuffle_partitions=shuffle_partitions
        )

    def rebucket(self, new_n_buckets: int, shuffle_partitions: int | None = None) -> str:
        """BUCKET-COUNT EVOLUTION (Iceberg partition-spec evolution for
        the bucket transform): rewrite the whole table under a new
        ``pmod(xxhash64(conv_id), new_n)`` layout in one resolved pass
        and commit it as a snapshot. The operational lever when key
        cardinality outgrows the layout — at 100 TB a table created
        with 32 buckets and now holding 10^9 conversations needs more
        write parallelism and finer read_key pruning, and bucket count
        is baked into every file's placement, so this is necessarily a
        full rewrite (ONE shuffle: resolve is bucket-local, then one
        range-exchange on the new bucket id).

        Semantics-invisible: the rewrite is the fold/LWW-resolved state
        (tombstones retained, like compaction without a purge horizon),
        the exactly-once ledger / watermarks / patched-column properties
        carry over untouched, and TIME TRAVEL still works — per-version
        manifests pin their own ``n_buckets``, so ``read_key(version=old)``
        prunes with the OLD transform against the OLD file set (files
        stay on disk until gc_orphans expires the version).

        Concurrency: single-maintenance-writer, conflict-ABORTED. A
        file appended concurrently under the old layout cannot be
        retained (its rows span many NEW buckets, so keeping it would
        poison read_key pruning) — if any commit lands between the read
        and this commit, the rewrite is abandoned (staged files
        orphaned for GC) and ValueError raised; the caller retries in a
        quiet window. That is the Iceberg RewriteDataFiles conflict
        rule, stricter here because the partition SPEC itself changes.
        Raises on no-op (same bucket count)."""
        if new_n_buckets < 1:
            raise ValueError(f"rebucket: need >= 1 bucket, got {new_n_buckets}")
        m0 = self.manifest()
        if new_n_buckets == m0.n_buckets:
            raise ValueError(f"rebucket: table already has {new_n_buckets} buckets")
        resolved = self.read(with_deleted=True, version=m0.version)
        n = shuffle_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        staged = self.new_staging_dir()
        (
            self.to_physical(resolved, m0)
            .withColumn("__bucket", bucket_expr(F.col("conv_id"), new_n_buckets))
            .repartitionByRange(min(n, new_n_buckets), "__bucket", "conv_id")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(staged)
        )
        adoption = uuid.uuid4().hex
        adopted = self._adopt_staged(staged, list(range(new_n_buckets)), adoption)
        stats = self._collect_file_stats([r for rs in adopted.values() for r in rs])
        snapshot = uuid.uuid4().hex

        def run() -> str:
            m = self.manifest()
            if m.version != m0.version:
                # adopted files become unreferenced -> gc_orphans fodder
                raise ValueError(
                    "rebucket: concurrent commit landed "
                    f"(v{m0.version} -> v{m.version}); retry in a quiet window"
                )
            old_snapshot = m.snapshot_id
            m.n_buckets = new_n_buckets
            m.buckets = {b: rels for b, rels in adopted.items() if rels}
            # full rewrite: the stats map is exactly the new files'
            m.properties["file_stats"] = stats
            m.parent = m.version
            m.version = self._alloc_version()
            m.snapshot_id = snapshot
            m.lineage.append(
                {
                    "op": "rebucket",
                    "from_buckets": m0.n_buckets,
                    "to_buckets": new_n_buckets,
                    "snapshot_id": snapshot,
                    "parent_snapshot": old_snapshot,
                }
            )
            self._write_manifest(m)
            return snapshot

        return self._with_commit_lock(run)

    def startup_maintenance(
        self,
        keep_versions: int = 3,
        staging_grace_seconds: float = 3600.0,
        max_age_seconds: float | None = None,
    ) -> dict:
        """Resume-time housekeeping for a process that may have crashed
        anywhere — including the window between a background
        compaction's commit and the next apply (the shape pinned by
        test_crash_window_between_compaction_commit_and_next_apply):
        run GC inside the staging grace window (live-manifest files and
        fresh staging dirs are untouchable by construction), then
        report the table state the resumed stream starts from. The
        per-app exactly-once ledger makes re-delivered batches no-op,
        so callers just run this and restart the stream."""
        deleted = self.gc_orphans(
            keep_versions=keep_versions,
            staging_grace_seconds=staging_grace_seconds,
            max_age_seconds=max_age_seconds,
        )
        m = self.manifest()
        return {
            "version": m.version,
            "snapshot_id": m.snapshot_id,
            "deleted_orphans": len(deleted),
            "committed_batches": {
                app: int(b) for app, b in m.properties.get("committed_batches", {}).items()
            },
            # dangling audit state a resuming operator must decide on:
            # branches awaiting publish/drop, staged WAPs awaiting
            # publish/reject (both retention-protected until resolved)
            "branches": self._read_refs(),
            "staged_waps": sorted(m.properties.get("wap", {})),
        }

    def gc_orphans(
        self,
        keep_versions: int = 3,
        staging_grace_seconds: float = 3600.0,
        max_age_seconds: float | None = None,
    ) -> list[str]:
        """Delete data files referenced by NO manifest within the last
        ``keep_versions`` committed versions (and drop older manifests).
        Time travel stays available for the kept window; everything
        older becomes unreadable — the Iceberg expire-snapshots +
        remove-orphan-files maintenance pair. Returns deleted paths.

        Staging dirs are only reclaimed when their mtime is older than
        ``staging_grace_seconds``: a dir younger than the grace window
        may belong to an apply/compaction that is mid-write in another
        process, and deleting it would make the in-flight commit adopt
        an empty file list while exactly-once tracking still marks the
        batch committed — permanent silent loss. An hour-old staging
        dir can only be a crashed writer (a healthy batch commits in
        seconds). Pass 0 only when the caller KNOWS no writer is live.

        Retention is per-REF: main keeps its last ``keep_versions``
        ancestors (parent-link walk — version numbers are globally
        allocated across chains, so a chain is NOT a numeric range);
        each BRANCH keeps its head's chain all the way DOWN TO a
        version main's window retains (its fork point, in the common
        case) — pruning a mid-chain branch manifest would break the
        ancestor walk ``fast_forward`` relies on and brick the publish.
        Tagged versions stay until drop_tag; staged WAP files on any
        ref head are live. ``max_age_seconds`` adds time-based retention
        (the Iceberg ``expire_snapshots(olderThan, retainLast)`` pair):
        main's chain is ALSO kept while commits are younger than the
        cutoff — ``keep_versions`` is then the retain-last floor, the
        age bound the ceiling. The ENTIRE pass — keep-set planning AND
        deletion — runs under the commit lock, so a commit can never
        land between the plan and the delete and lose its just-written
        manifest (deletion is metadata-scale: a few listdir + unlink)."""
        import time as _time

        cutoff = None if max_age_seconds is None else _time.time() - max_age_seconds

        def run() -> list[str]:
            refs = self._read_refs()
            keep_set: set[int] = set()
            referenced: set[str] = set()
            # main's window first: branch walks stop when they reach
            # it. All keep-set walks read the raw manifest dict — ONE
            # small JSON per hop — never self.manifest(v), which folds
            # the delta chain into full O(live-files) state per call
            # (and would evict hot heads from the state cache) just to
            # follow a parent pointer.
            v: int | None = self._head_version("main")
            hops = 0
            while v is not None:
                try:
                    d = self._manifest_dict(v)
                except FileNotFoundError:
                    break
                if hops >= keep_versions:
                    if cutoff is None:
                        break
                    ts = d["properties"].get("committed_at")
                    # pre-stamp manifests (no committed_at) count as old
                    if ts is None or float(ts) < cutoff:
                        break
                keep_set.add(v)
                hops += 1
                v = d["parent"]
            for hv in refs.values():
                v = hv
                while v is not None and v not in keep_set:
                    keep_set.add(v)
                    try:
                        v = self._manifest_dict(v)["parent"]
                    except FileNotFoundError:
                        break
            tag_versions: set[int] = set()
            for hv in [self._head_version("main"), *refs.values()]:
                head_m = self.manifest(hv)
                tag_versions.update(
                    int(t) for t in head_m.properties.get("tags", {}).values()
                )
                for w in head_m.properties.get("wap", {}).values():
                    for fs in w.get("buckets", {}).values():
                        referenced.update(fs)
            keep_set.update(tag_versions)
            # tagged versions keep not just their own manifest but the
            # PARENT-LINK PATH from each ref head down to them: rollback
            # (tag=...), history walks and _is_ancestor all need the
            # intermediate manifests, and "protected until drop_tag"
            # must mean reachable, not merely readable (same walk as
            # branch heads)
            if tag_versions:
                for hv in [self._head_version("main"), *refs.values()]:
                    path: list[int] = []
                    v = hv
                    while v is not None:
                        path.append(v)
                        try:
                            v = self._manifest_dict(v)["parent"]
                        except FileNotFoundError:
                            break
                    deepest = max(
                        (i for i, pv in enumerate(path) if pv in tag_versions),
                        default=-1,
                    )
                    keep_set.update(path[: deepest + 1])
            # delta-manifest boundary materialization: a kept DELTA
            # version whose reconstruction parent is about to be dropped
            # is rewritten IN PLACE as a FULL manifest — same logical
            # state (the cache stays valid), same version/snapshot_id,
            # same add/remove summary (CDF semantics preserved); only
            # the storage encoding changes. This keeps retention
            # granularity at single versions instead of forcing whole
            # delta chains to survive until their rollup ages out.
            # Parents are still on disk here (deletion happens below),
            # so reconstruction cannot dangle; os.replace keeps the
            # rewrite atomic for concurrent readers.
            for kv in sorted(keep_set):
                try:
                    d = self._manifest_dict(kv)
                except FileNotFoundError:
                    continue
                files = d.get("files")
                if files is None or files.get("full") is not None:
                    continue  # already full (or legacy-full)
                if d.get("parent") in keep_set:
                    continue  # chain stays intact through this GC
                buckets, stats, _ = self._state(kv, d)
                files["full"] = {
                    "buckets": {b: list(fs) for b, fs in buckets.items()},
                    "stats": {k: list(v) for k, v in stats.items()},
                }
                mpath = os.path.join(self.root, "_manifests", f"v{kv}.json")
                tmp = mpath + f".tmp.{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    f.write(json.dumps(d))
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, mpath)
                _cache_put(
                    (self.root, kv),
                    (
                        {b: tuple(fs) for b, fs in buckets.items()},
                        {k: list(v) for k, v in stats.items()},
                        0,
                    ),
                )
            for kv in sorted(keep_set):
                try:
                    m = self.manifest(kv)
                except FileNotFoundError:
                    continue
                for fs in m.buckets.values():
                    referenced.update(fs)
            deleted: list[str] = []
            data_dir = os.path.join(self.root, "data")
            for fn in os.listdir(data_dir):
                rel = f"data/{fn}"
                if rel not in referenced:
                    os.remove(os.path.join(data_dir, fn))
                    deleted.append(rel)
            man_dir = os.path.join(self.root, "_manifests")
            for fn in os.listdir(man_dir):
                mv = int(fn[1:-5])  # v{N}.json
                if mv not in keep_set:
                    os.remove(os.path.join(man_dir, fn))
            return deleted

        deleted = self._with_commit_lock(run)
        # clear abandoned staging dirs (crashed writes) — but only past
        # the grace window, never an in-flight writer's dir (see docstring)
        import time as _time

        staging = os.path.join(self.root, "_staging")
        if os.path.isdir(staging):
            cutoff = _time.time() - staging_grace_seconds
            for d in os.listdir(staging):
                p = os.path.join(staging, d)
                try:
                    if os.path.getmtime(p) <= cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    continue
        return deleted

    # ------------------------------------------------------------ metrics

    def lineage(self) -> list[dict[str, Any]]:
        return self.manifest().lineage

    def lineage_df(self) -> DataFrame:
        rows = self.lineage()
        if not rows:
            raise ValueError("no lineage yet")
        return self.spark.createDataFrame(rows)

    # ---------------------------------------------- metadata tables
    #
    # The Iceberg metadata-table analog (SELECT * FROM t.snapshots /
    # t.files / t.history): the table's own commit history, live file
    # inventory, and ref state as queryable DataFrames. Built
    # driver-side from the retained manifests — metadata is
    # metadata-scale (one row per commit / per file), exactly what
    # Iceberg's own metadata tables read, so no distributed scan is
    # needed or wanted.

    def _retained_versions(self) -> list[int]:
        man_dir = os.path.join(self.root, "_manifests")
        return sorted(int(f[1:-5]) for f in os.listdir(man_dir) if f.endswith(".json"))

    def snapshots_df(self) -> DataFrame:
        """One row per retained committed version: commit kind derived
        STRUCTURALLY from the file diff vs parent (append / rewrite /
        metadata — same classification the CDF source and
        read_changes use), plus file/row-tracking counts."""
        schema = T.StructType([
            T.StructField("version", T.LongType()),
            T.StructField("snapshot_id", T.StringType()),
            T.StructField("parent", T.LongType()),
            T.StructField("operation", T.StringType()),
            T.StructField("n_buckets", T.LongType()),
            T.StructField("n_files", T.LongType()),
            T.StructField("files_added", T.LongType()),
            T.StructField("files_removed", T.LongType()),
            T.StructField("is_current", T.BooleanType()),
        ])
        cur = self.manifest().version
        rows = []
        for v in self._retained_versions():
            m = self.manifest(v)
            files = {f for fs in m.buckets.values() for f in fs}
            if m.files_removed is not None:  # stored delta summary
                added = sum(len(fs) for fs in m.files_added.values())
                removed = len(m.files_removed)
                op = (
                    "create" if m.parent is None
                    else "metadata" if added == 0 and removed == 0
                    else "append" if removed == 0
                    else "rewrite"
                )
            else:  # legacy full-format manifest: structural parent diff
                parent_files: set[str] | None = None
                if m.parent is not None:
                    try:
                        pm = self.manifest(m.parent)
                        parent_files = {f for fs in pm.buckets.values() for f in fs}
                    except FileNotFoundError:
                        parent_files = None  # expired parent: diff unknowable
                if parent_files is None:
                    added, removed = (len(files), 0) if m.parent is None else (-1, -1)
                    op = "create" if m.parent is None else "unknown"
                else:
                    added = len(files - parent_files)
                    removed = len(parent_files - files)
                    op = (
                        "metadata" if added == 0 and removed == 0
                        else "append" if removed == 0
                        else "rewrite"
                    )
            rows.append((v, m.snapshot_id, m.parent, op, m.n_buckets,
                         len(files), added, removed, v == cur))
        return self.spark.createDataFrame(rows, schema)

    def files_df(self, version: int | None = None) -> DataFrame:
        """Live data-file inventory of a version (default current):
        bucket, path, on-disk size, and the per-file key range when
        commit-time footer stats were recorded (file_stats — the
        DataFile lower/upper-bounds analog; NULL for stat-less files,
        which readers always scan)."""
        schema = T.StructType([
            T.StructField("bucket", T.LongType()),
            T.StructField("path", T.StringType()),
            T.StructField("size_bytes", T.LongType()),
            T.StructField("key_min", T.StringType()),
            T.StructField("key_max", T.StringType()),
        ])
        m = self.manifest(version)
        stats = m.properties.get("file_stats") or {}
        rows = []
        for b, fs in m.buckets.items():
            for rel in fs:
                try:
                    size = os.path.getsize(os.path.join(self.root, rel))
                except OSError:
                    size = -1
                st = stats.get(rel)
                ok = st is not None and len(st) == 2
                rows.append((int(b), rel, size,
                             st[0] if ok else None, st[1] if ok else None))
        return self.spark.createDataFrame(rows, schema)

    def history_df(self) -> DataFrame:
        """The current head's ancestry chain (Iceberg history): refs —
        tags and the staged WAP ids — annotated per version."""
        schema = T.StructType([
            T.StructField("version", T.LongType()),
            T.StructField("snapshot_id", T.StringType()),
            T.StructField("is_current_ancestor", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ])
        head = self.manifest()
        tags_by_v: dict[int, list[str]] = {}
        for name, v in (head.properties.get("tags") or {}).items():
            tags_by_v.setdefault(int(v), []).append(name)
        ancestry = set()
        v: int | None = head.version
        while v is not None:
            ancestry.add(v)
            try:
                v = self._manifest_dict(v)["parent"]
            except FileNotFoundError:
                break
        rows = [
            (v, self._manifest_dict(v)["snapshot_id"], v in ancestry,
             sorted(tags_by_v.get(v, [])))
            for v in self._retained_versions()
        ]
        return self.spark.createDataFrame(rows, schema)

    def refs_df(self) -> DataFrame:
        """The Iceberg ``refs`` metadata table: one row per named ref —
        "main", every branch (mutable pointers), every tag (immutable
        pins) — with the version and snapshot it resolves to."""
        schema = T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("version", T.LongType()),
            T.StructField("snapshot_id", T.StringType()),
        ])
        rows = [("main", "branch", self._head_version("main"),
                 self.manifest().snapshot_id)]
        for name, v in sorted(self._read_refs().items()):
            rows.append((name, "branch", v, self.manifest(v).snapshot_id))
        for name, v in sorted(self.manifest().properties.get("tags", {}).items()):
            rows.append((name, "tag", int(v), self.manifest(int(v)).snapshot_id))
        return self.spark.createDataFrame(rows, schema)
