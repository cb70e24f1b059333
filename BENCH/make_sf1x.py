"""Build an approximate sf1.0-scale measurement dataset (/dev/shm/sf1x)
by replicating sf0.1 10x with id remapping and mild text perturbation.

NOT the driver's sf1.0 (that generator is driver-side); used ONLY for
relative A/B timing of optimizations at 10x volume so config and shapes
tuned at sf0.1 are validated at the driver's measurement scale. Small
dimension tables are copied unscaled (they don't scale with sf anyway).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1X_DIR", "/dev/shm/sf1x")
COPIES = 10


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    # documents: 5k -> 50k. Offset doc_id; perturb text per copy so the
    # duplicate-pair density stays in the same ballpark as organic data
    # (a pure 10x copy makes every doc a 10-way exact dup).
    con.execute(f"""
        COPY (
          SELECT doc_id + 5000*c AS doc_id,
                 CASE WHEN c = 0 THEN text
                      ELSE text || ' v' || c || ' ' || substr(md5(text || c), 1, 6)
                 END AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'), range(0, {COPIES}) t(c)
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)

    # events: 100k -> 1M. Offset event_id (keeps lsn uniqueness), shift
    # user_id per copy for new conversations, shift ts slightly.
    con.execute(f"""
        COPY (
          SELECT event_id + 100000*c AS event_id,
                 ts + INTERVAL (c) SECOND AS ts,
                 user_id + 10000*c AS user_id,
                 event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'), range(0, {COPIES}) t(c)
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)

    # embeddings: 2k -> 20k. Offset vec_id; nudge one coordinate per copy.
    con.execute(f"""
        COPY (
          SELECT vec_id + 2000*c AS vec_id,
                 list_transform(embedding, x -> x + 0.001*c) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), range(0, {COPIES}) t(c)
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
    """)

    # lineitem/orders: 10x with key offsets (enough for join/agg timing).
    con.execute(f"""
        COPY (
          SELECT l_orderkey + 600000*c AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet'), range(0, {COPIES}) t(c)
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT o_orderkey + 600000*c AS o_orderkey, o_custkey, o_orderstatus,
                 o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'), range(0, {COPIES}) t(c)
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
    """)

    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t in sorted(os.listdir(DST)):
        print(t, os.path.getsize(os.path.join(DST, t)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
