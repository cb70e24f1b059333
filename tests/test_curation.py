"""Curation operators: decontamination, sequence packing, stratified
sampling, PII redaction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from audience_behavior_semantic_etl_spark.operators.curation import (
    contamination_stats,
    decontaminate,
    exact_stratified_sample,
    pack_sequences,
    stratified_sample,
)
from audience_behavior_semantic_etl_spark.operators.text import redact_pii, token_count


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "completely unrelated text about cooking pasta with fresh tomato sauce"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (4, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )


def test_contamination_stats_flags_overlap(corpus, bench_docs):
    out = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, bench_docs, "text", "doc_id").collect()
    }
    assert out[1]["contamination"] == 1.0  # verbatim copy
    assert out[2]["n_contaminated"] == 0  # disjoint
    assert 0.5 < out[3]["contamination"] < 1.0  # near-copy: most shingles shared


def test_decontaminate_drops_only_contaminated(corpus, bench_docs):
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench_docs, "text", "doc_id", threshold=0.5).collect()
    )
    assert kept == [2, 4]  # 1 and 3 flagged; zero/low-overlap docs retained


def test_pack_sequences_tiles_each_group_exactly(spark):
    df = spark.createDataFrame(
        [(i, 7 + (i * 13) % 40) for i in range(50)], "doc_id long, n_tok long"
    )
    budget, n_groups = 32, 4
    segs = pack_sequences(df, "doc_id", "n_tok", budget=budget, n_groups=n_groups).collect()
    tok = {r["doc_id"]: r["n_tok"] for r in df.collect()}
    # every document's spans concatenate to exactly [0, n_tok)
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["tok_begin"])
        assert rs[0]["tok_begin"] == 0 and rs[-1]["tok_end"] == tok[d]
        for a, b in zip(rs, rs[1:]):
            assert a["tok_end"] == b["tok_begin"]
            assert b["seq"] == a["seq"] + 1  # straddles land in consecutive seqs
    assert set(by_doc) == set(tok)
    # every (grp, seq) except each group's last holds exactly `budget` tokens
    by_seq: dict[tuple, int] = {}
    for r in segs:
        by_seq[(r["grp"], r["seq"])] = by_seq.get((r["grp"], r["seq"]), 0) + (
            r["tok_end"] - r["tok_begin"]
        )
    last = {g: max(s for (gg, s) in by_seq if gg == g) for g, _ in by_seq}
    for (g, s), n in by_seq.items():
        if s < last[g]:
            assert n == budget
        else:
            assert 0 < n <= budget


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)], "doc_id long, lang string"
    )
    s1 = stratified_sample(df, "lang", "doc_id", {"en": 0.5, "de": 0.1}).collect()
    s2 = stratified_sample(df, "lang", "doc_id", {"en": 0.5, "de": 0.1}).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    n = {lang: sum(1 for r in s1 if r["lang"] == lang) for lang in ("en", "de", "fr")}
    assert abs(n["en"] - 500) < 80 and abs(n["de"] - 100) < 50
    assert n["fr"] == 0  # default rate 0
    # re-salting draws an independent sample
    s3 = stratified_sample(df, "lang", "doc_id", {"en": 0.5}, salt="other").collect()
    assert {r["doc_id"] for r in s3} != {r["doc_id"] for r in s1 if r["lang"] == "en"}


def test_exact_stratified_sample(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(200)], "doc_id long, grp string"
    )
    out = exact_stratified_sample(df, "grp", "doc_id", 7).collect()
    n = {g: sum(1 for r in out if r["grp"] == g) for g in ("a", "b")}
    assert n == {"a": 7, "b": 7}
    again = exact_stratified_sample(df, "grp", "doc_id", 7).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 10.0.255.7 rebooted"),
            (3, "card 4111111111111111 charged"),
            (4, "call +1 (415) 555-0132 today"),
            (5, "clean text stays clean"),
        ],
        "i long, t string",
    )
    got = {r["i"]: r["r"] for r in df.select("i", redact_pii("t").alias("r")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> rebooted"
    assert got[3] == "card <NUM> charged"
    assert got[4] == "call <PHONE> today"
    assert got[5] == "clean text stays clean"


def test_token_count_consistency_for_packing(spark, corpus):
    # pack_sequences over real token counts: budget larger than any doc
    df = corpus.select("doc_id", token_count("text").alias("n_tok"))
    segs = pack_sequences(df, "doc_id", "n_tok", budget=1000, n_groups=2).collect()
    assert all(r["seq"] == 0 for r in segs)  # everything fits in seq 0 per group


def test_materialize_sequences_roundtrip(spark):
    """Concatenating a group's sequences in seq order must reproduce
    exactly the group's documents' token streams in doc order — no
    token lost, duplicated, or reordered across span splits."""
    from audience_behavior_semantic_etl_spark.operators.curation import (
        materialize_sequences,
    )
    from audience_behavior_semantic_etl_spark.operators.text import tokens as tok_col

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(3 + (i * 7) % 23))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs_tok = docs.select("doc_id", tok_col(F.col("text")).alias("toks"))
    tc = docs_tok.select("doc_id", F.size("toks").cast("bigint").alias("n_tok"))
    from audience_behavior_semantic_etl_spark.operators.curation import pack_sequences

    segs = pack_sequences(tc, "doc_id", "n_tok", budget=16, n_groups=2)
    mat = materialize_sequences(segs, docs_tok, "doc_id").collect()

    by_grp: dict[int, list] = {}
    for r in mat:
        by_grp.setdefault(r["grp"], []).append(r)
    toks = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    for g, rs in by_grp.items():
        rs.sort(key=lambda r: r["seq"])
        got = " ".join(r["seq_text"] for r in rs).split()
        want = [w for d in sorted(toks) if d % 2 == g for w in toks[d]]
        assert got == want, f"group {g} token stream mismatch"
        for r in rs[:-1]:
            assert r["n_tokens"] == 16, "non-tail sequences must be full"


def test_threshold_stratified_sample_mega_stratum(spark):
    """The skew-safe two-pass variant: ~n per stratum without a
    per-stratum window (no single-task mega-stratum bound), map-only
    after the broadcast of per-stratum thresholds; deterministic; a
    stratum smaller than n comes back whole; NULL strata are one ''
    stratum like the other samplers."""
    from audience_behavior_semantic_etl_spark.operators.curation import (
        threshold_stratified_sample,
    )

    rows = [(i, "mega") for i in range(5000)] + [(i + 10000, "tiny") for i in range(30)]
    rows += [(i + 20000, None) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = threshold_stratified_sample(df, "grp", "doc_id", 100).collect()
    n = {}
    for r in out:
        n[r["grp"]] = n.get(r["grp"], 0) + 1
    # binomial around n: 100 ± ~4*sqrt(100)
    assert abs(n["mega"] - 100) < 40, n
    assert abs(n[None] - 100) < 40, n
    assert n["tiny"] == 30, "stratum smaller than n must come back whole"
    again = threshold_stratified_sample(df, "grp", "doc_id", 100).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)
    # no Window/per-stratum serialization in the plan
    plan = threshold_stratified_sample(df, "grp", "doc_id", 100)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
