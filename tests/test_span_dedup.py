"""Duplicated-span detection (operators.dedup.duplicated_spans /
span_dedup_stats): position semantics, cross-document localization,
and the no-self-join plan shape. Corpus-level parity with the DuckDB
oracle is covered by test_oracle_parity[q_span_dedup]."""

from __future__ import annotations

from pyspark.sql import functions as F

from audience_behavior_semantic_etl_spark.operators.dedup import (
    duplicated_spans,
    span_dedup_stats,
    window_hashes,
)
from audience_behavior_semantic_etl_spark.operators.text import tokens


def _docs(spark):
    shared = "alpha beta gamma delta"  # the duplicated 4-token span
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"five six seven {shared} eight"),
        (3, "nine ten eleven twelve thirteen fourteen"),
        (4, "short text"),  # < k tokens: no windows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_positions_and_counts(spark):
    out = duplicated_spans(_docs(spark), "text", "doc_id", k=4, min_count=2).collect()
    # exactly one span is shared: 'alpha beta gamma delta', at 0-based
    # token offset 2 in doc 1 and offset 3 in doc 2
    assert {(r["doc_id"], r["pos"]) for r in out} == {(1, 2), (2, 3)}
    assert all(r["n_occurrences"] == 2 and r["n_docs"] == 2 for r in out)
    assert len({r["span_hash"] for r in out}) == 1


def test_span_dedup_stats_fraction_and_short_doc_exclusion(spark):
    got = {
        r["doc_id"]: r
        for r in span_dedup_stats(_docs(spark), "text", "doc_id", k=4, min_count=2).collect()
    }
    assert set(got) == {1, 2, 3}, "sub-k doc must be excluded"
    # doc 1: 8 tokens -> 5 windows, 1 duplicated
    assert got[1]["n_windows"] == 5 and got[1]["n_dup_windows"] == 1
    assert abs(got[1]["dup_fraction"] - 0.2) < 1e-9
    assert got[3]["n_dup_windows"] == 0


def test_window_hashes_positional_not_distinct(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    row = df.select(
        window_hashes(tokens(F.col("text")), 2).alias("w")
    ).collect()[0]
    assert len(row["w"]) == 5, "every position, duplicates kept"
    assert len(set(row["w"])) == 2, "'a b' and 'b a' alternate"


def test_span_dedup_plan_has_no_document_self_join(spark):
    df = _docs(spark)
    plan = (
        span_dedup_stats(df, "text", "doc_id", k=4, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---- pure-kernel property checks (no Spark; fast) -------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from audience_behavior_semantic_etl_spark.streaming.sessionize import _split_sessions


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=1000),
)
def test_split_sessions_matches_naive_reference(ts, gap):
    ts = sorted(ts)
    got = _split_sessions(ts, gap)
    # naive reference: walk and cut
    sessions, cur = [], [ts[0]]
    for t in ts[1:]:
        if t - cur[-1] > gap:
            sessions.append(cur)
            cur = [t]
        else:
            cur.append(t)
    sessions.append(cur)
    want = [(s[0], s[-1], len(s)) for s in sessions]
    assert got == want
    # invariants: every event accounted for exactly once; sessions
    # ordered and separated by > gap
    assert sum(n for _, _, n in got) == len(ts)
    for (s1, e1, _), (s2, _, _) in zip(got, got[1:]):
        assert s2 - e1 > gap and s1 <= e1 <= s2


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must produce the same partition as a
    brute-force union-find on randomized graphs — including chains
    (worst-case diameter), isolated pairs, and the a-c/b-c shape where
    the greedy keep-smallest survivor rule would keep two docs of one
    transitive cluster."""
    import random

    from audience_behavior_semantic_etl_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    edges = [(1, 3), (2, 3)]  # greedy-vs-cluster divergence shape
    edges += [(10 + i, 11 + i) for i in range(6)]  # chain, diameter 6
    nodes = list(range(100, 140))
    edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]

    # brute-force union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # normalize to min-id representative
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[find(x)] for x in parent}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got_df = connected_components(df, "id_a", "id_b")
    got = {r["node"]: r["component"] for r in got_df.collect()}
    got_df.unpersist()
    assert got == want
