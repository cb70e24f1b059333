"""Driver-side flush-sentinel writer for bounded availableNow drains.

The windowed/sessionize drains inject one-row "flush" files whose late
event time advances the watermark past every real window/session so the
final state emits (module docstrings in streaming/windowed.py and
streaming/sessionize.py). Writing those rows through
``static.limit(1)....write.parquet`` cost TWO Spark jobs per drain —
pure fixed overhead on every streaming query (guide §1.2: the work is
one row; the job machinery was the cost). This helper builds the same
one-row file driver-side with pyarrow: first row of an existing source
file, selected columns overridden, written straight to the staged
source dir. Values and schema are identical to what the Spark path
produced — only the job count changes.
"""

from __future__ import annotations

import re

_INTERVAL_RE = re.compile(r"^\s*(\d+)\s+(second|minute|hour|day)s?\s*$", re.IGNORECASE)

_UNIT_S = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def parse_interval_seconds(spec: str) -> int | None:
    """``"90 seconds"`` / ``"2 hours"`` -> seconds; None when the spec
    is not a simple single-unit interval (callers then fall back to the
    Spark expression path)."""
    m = _INTERVAL_RE.match(spec)
    if not m:
        return None
    return int(m.group(1)) * _UNIT_S[m.group(2).lower()]


def write_sentinel(
    src_files: str | list[str], dst: str, overrides: dict[str, object]
) -> None:
    """One-row parquet sentinel: first row found in ``src_files`` with
    ``overrides`` applied ({column: value}; None stores a typed null).
    Written with pyarrow on the driver — no Spark job. Empty part
    files (zero row groups — Spark writes them for empty partitions)
    are skipped; if every file is empty the sentinel is a typed-null
    row with only the overrides set, which is exactly what the old
    ``limit(1)`` path produced for a row-less source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(src_files, str):
        src_files = [src_files]
    tbl = None
    for f in src_files:
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows > 0:
            tbl = pf.read_row_group(0).slice(0, 1)
            break
        schema = pf.schema_arrow
    if tbl is None:
        tbl = pa.Table.from_arrays(
            [pa.nulls(1, type=f.type) for f in schema], schema=schema
        )
    for name, val in overrides.items():
        i = tbl.schema.get_field_index(name)
        arr = pa.array([val], type=tbl.schema.field(i).type)
        tbl = tbl.set_column(i, tbl.schema.field(i), arr)
    pq.write_table(tbl, dst)
