"""Corpus-curation operators beyond dedup: benchmark decontamination,
sequence packing, and stratified sampling — the remaining stages a
large-scale training-data pipeline runs between "raw corpus" and
"training shards".

Scale design:
- decontamination is a broadcast semi-join: the benchmark shingle set
  is tiny relative to the corpus (MMLU-sized, not web-sized), so the
  corpus side stays map-only (explode + hash) with ONE aggregation
  shuffle on doc_id. The corpus is never self-joined.
- sequence packing shards the corpus into independent packing groups
  (pmod of the id) and runs the token-offset cumsum per group — a
  window over a bounded partition, no global sort, no driver state.
  This is the standard "concatenate then split at the context-length
  boundary" LLM packing rule; documents may straddle sequence
  boundaries and the output is the (doc, sequence, token-span)
  assignment table.
- stratified sampling is map-only: the keep/drop decision is a pure
  function of (id, stratum) via a portable md5-derived uniform, so the
  sample is deterministic, reproducible across engines (the DuckDB
  oracle reproduces it bit-for-bit), and requires no shuffle at all.
  The exact-n variant is one window shuffle on the stratum key.

All hashes are md5-based (portable) — same rationale as
operators.dedup: an independent SQL engine must reproduce every
decision bit-for-bit so sampling/packing/decontamination become part
of the checked contract rather than "random" stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from audience_behavior_semantic_etl_spark.operators.dedup import shingled


def md5_unit_interval(c: Column) -> Column:
    """Deterministic uniform in [0,1): first 8 hex chars of md5 as a
    32-bit integer over 2^32. Portable: DuckDB reproduces it with
    strpos arithmetic (see _md5_u32_sql in the driver contract)."""
    u32 = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return u32.cast("double") / F.lit(float(2**32))


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    k: int = 3,
) -> DataFrame:
    """Per-document benchmark-overlap stats: (id, n_shingles,
    n_contaminated, contamination) where n_contaminated counts the
    document's distinct k-shingles that appear ANYWHERE in the
    benchmark corpus — the standard n-gram test-set-decontamination
    rule for LLM training data.

    Shape at scale: the benchmark's distinct-shingle set is broadcast
    (benchmarks are MB-sized; the corpus is the TB side), the corpus is
    explode+hash map-only, and the only shuffle is the per-doc count
    aggregation on a uniform key. Zero-shingle documents are excluded
    (contamination is undefined for them; explode of an empty shingle
    array yields no rows, so they fall out of the aggregate naturally).

    ONE corpus pass: because ``shingled`` emits DISTINCT shingles per
    document, size(sh) equals the exploded row count, so n_shingles and
    n_contaminated come out of the SAME explode -> broadcast-left-join
    -> groupBy.

    Cache discipline (measured, sf0.1): the shingle frame MUST be
    persisted before the explode — Spark re-evaluates a Generate's
    expensive input array per OUTPUT row, and neither an exchange nor
    expression restructuring prevents it (explode-over-unpersisted ran
    31.6 s vs 1.1 s persisted; a repartition barrier still ran 28.2 s).
    To avoid the session-lifetime row-cache leak the persist would
    otherwise create (the concurrency-collapse hazard CLAUDE.md
    documents), the per-doc AGGREGATE — bounded at one 3-column row
    per document — is materialized eagerly inside this call and the
    row-heavy shingle cache is dropped before returning. The returned
    frame is cached; callers composing it further may ``unpersist()``
    it when done.
    """
    # the benchmark side pays the same Generate blowup unpersisted —
    # same barrier, same lifetime (dropped after the pass below)
    bench_sh = shingled(benchmark, bench_text_col or text_col, id_col, k).persist()
    bench_set = (
        bench_sh.select(F.explode("sh").alias("s"))
        .select(F.xxhash64("s").alias("s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corp_sh = shingled(corpus, text_col, id_col, k).persist()
    ex = corp_sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("s")
    )
    stats = (
        ex.join(F.broadcast(bench_set), "s", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_contaminated") / F.col("n_shingles"), 4)
        )
        .withColumnRenamed("id", id_col)
        .persist()
    )
    stats.count()  # one pass: builds the caches, then the big ones go
    corp_sh.unpersist()
    bench_sh.unpersist()
    return stats


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Corpus minus contaminated documents (contamination >= threshold):
    one anti-join against the flagged-id set. Zero-shingle documents
    are retained (nothing to match on)."""
    flagged = (
        contamination_stats(corpus, benchmark, text_col, id_col, k=k)
        .filter(F.col("contamination") >= threshold)
        .select(F.col(id_col).alias("__flag_id"))
    )
    return corpus.join(
        flagged, corpus[id_col] == flagged["__flag_id"], "left_anti"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_groups: int = 32,
) -> DataFrame:
    """Pack documents into fixed token-budget training sequences,
    "concatenate then split" style: within each packing group documents
    are laid end-to-end in id order and cut every ``budget`` tokens; a
    document whose span crosses a cut is split across consecutive
    sequences. Returns the assignment table
    (id, grp, seq, tok_begin, tok_end): document-relative token span
    [tok_begin, tok_end) landing in sequence ``seq`` of group ``grp``.

    Every sequence is exactly ``budget`` tokens except the last of each
    group; no token is dropped or duplicated (tests assert the tiling).

    Scale shape: ``grp = pmod(id, n_groups)`` shards the corpus into
    independent packing groups, so the cumsum window runs per group —
    ONE shuffle on grp, no global sort. n_groups trades shard
    independence (parallelism ≥ n_groups) against cross-group packing
    loss (≤ budget-1 slack tokens per group tail); size it ≥ cluster
    cores, it costs nothing else. Zero-token documents are dropped
    (they occupy no span).
    """
    if budget <= 0 or n_groups <= 0:
        raise ValueError(f"budget and n_groups must be positive, got {budget}, {n_groups}")
    tc = F.col(token_count_col).cast("bigint")
    grp = F.pmod(F.col(id_col), F.lit(n_groups)).cast("int")
    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        df.filter(tc > 0)
        .select(F.col(id_col), tc.alias("__tc"), grp.alias("grp"))
        .withColumn("__off", F.coalesce(F.sum("__tc").over(w), F.lit(0)).cast("bigint"))
    )
    first_seq = F.floor(F.col("__off") / budget)
    last_seq = F.floor((F.col("__off") + F.col("__tc") - 1) / budget)
    return (
        staged.withColumn("seq", F.explode(F.sequence(first_seq, last_seq)))
        .select(
            id_col,
            "grp",
            F.col("seq").cast("bigint").alias("seq"),
            F.greatest(F.col("seq") * budget - F.col("__off"), F.lit(0))
            .cast("bigint")
            .alias("tok_begin"),
            F.least((F.col("seq") + 1) * budget - F.col("__off"), F.col("__tc"))
            .cast("bigint")
            .alias("tok_end"),
        )
    )


def materialize_sequences(
    segs: DataFrame,
    docs_tokens: DataFrame,
    id_col: str,
) -> DataFrame:
    """Turn a pack_sequences assignment table into actual training
    sequences: join each (doc, span) segment back to the document's
    token array, slice the span, and concatenate segments in document
    order per (grp, seq). Returns (grp, seq, seq_text, n_tokens).

    ``docs_tokens`` must carry (id_col, toks: array<string>) with the
    SAME token counts packing used. Determinism: segments aggregate via
    sort-by-doc-id array algebra, never bare collect_list order.

    Scale shape: the segment table joins docs on the id (broadcast or
    shuffle hash join on a uniform key), then ONE aggregation on
    (grp, seq). Every sequence is <= the packing budget by
    construction, so group state is bounded and no sequence row can
    blow up a task."""
    joined = segs.join(docs_tokens.select(F.col(id_col), F.col("toks")), id_col)
    piece = F.slice(
        F.col("toks"),
        (F.col("tok_begin") + 1).cast("int"),
        (F.col("tok_end") - F.col("tok_begin")).cast("int"),
    )
    per_seg = joined.select(
        "grp",
        "seq",
        F.struct(F.col(id_col).alias("id"), piece.alias("piece")).alias("seg"),
    )
    ordered = F.array_sort(F.collect_list("seg"))
    return per_seg.groupBy("grp", "seq").agg(
        F.array_join(
            F.flatten(F.transform(ordered, lambda s: s.getField("piece"))), " "
        ).alias("seq_text"),
        F.aggregate(
            F.transform(ordered, lambda s: F.size(s.getField("piece"))),
            F.lit(0),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("n_tokens"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum rate sampling: keep a row iff its
    md5-uniform (seeded by salt|stratum|id, so re-salting draws an
    independent sample) falls below the stratum's rate. Map-only — the
    decision is a pure row-local function; no shuffle, no RNG state,
    identical output on every engine and every run. This is how a
    100 TB pipeline re-weights sources/languages without a
    collect or a second pass.

    NULL strata are first-class: the stratum is coalesced to a sentinel
    ('') before seeding, so NULL rows get a valid uniform and sample at
    ``default_rate`` (or ``rates['']``). Without the coalesce the
    engines diverge — Spark's concat_ws SKIPS null args while ANSI
    string concat propagates NULL, silently dropping every NULL-stratum
    row on one engine only."""
    stratum = F.coalesce(F.col(stratum_col).cast("string"), F.lit(""))
    u = md5_unit_interval(
        F.concat_ws("|", F.lit(salt), stratum, F.col(id_col).cast("string"))
    )
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(stratum == s, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def exact_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Exactly-n-per-stratum sample: rank rows within each stratum by
    their md5-uniform (uniform ⇒ the first n are a uniform random
    subset) and keep rank <= n. Deterministic reservoir-sampling
    equivalent; ONE window shuffle on the stratum key. Ties are
    impossible in practice (md5 over distinct ids) but id breaks them
    deterministically anyway. NULL strata coalesce to '' (one stratum),
    matching :func:`stratified_sample`.

    SKEW HAZARD: the window partitions by stratum, so each stratum's
    rows serialize through ONE task. Fine for per-language/per-source
    sampling (strata ≈ tens–thousands, each a manageable slice); wrong
    when a single mega-stratum dominates the corpus — that stratum
    becomes one straggler task holding its whole slice. For that shape
    use :func:`threshold_stratified_sample`, which replaces the window
    with a two-pass rate estimate + map-only filter."""
    stratum = F.coalesce(F.col(stratum_col).cast("string"), F.lit(""))
    u = md5_unit_interval(
        F.concat_ws("|", F.lit(salt), stratum, F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(F.col("__u"), F.col(id_col))
    return (
        df.withColumn("__u", u)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__u", "__rk")
    )


def threshold_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Approximately-n-per-stratum sample that survives a mega-stratum:
    instead of ranking inside a per-stratum window (one task per
    stratum — :func:`exact_stratified_sample`'s documented skew bound),
    pass 1 computes each stratum's row count with a plain hash
    aggregate (partial-agg map-side combine, output bounded by
    #strata), pass 2 broadcasts the per-stratum keep-threshold
    ``n/count`` and filters on the SAME md5-uniform — map-only, fully
    parallel regardless of skew. Returns ~n ± O(sqrt(n)) rows per
    stratum (binomial, deterministic given salt); use the exact variant
    when the count must be exact and no stratum dominates."""
    stratum = F.coalesce(F.col(stratum_col).cast("string"), F.lit(""))
    u = md5_unit_interval(
        F.concat_ws("|", F.lit(salt), stratum, F.col(id_col).cast("string"))
    )
    counts = df.groupBy(stratum.alias("__s")).agg(F.count(F.lit(1)).alias("__n"))
    thresholds = counts.select(
        "__s",
        F.least(F.lit(1.0), F.lit(float(n_per_stratum)) / F.col("__n")).alias("__thr"),
    )
    return (
        df.withColumn("__s", stratum)
        .withColumn("__u", u)
        .join(F.broadcast(thresholds), "__s")
        .filter(F.col("__u") < F.col("__thr"))
        .drop("__s", "__u", "__thr")
    )
