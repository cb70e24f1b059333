"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot`` / ``l2_norm``: pure HOF expressions (zip_with +
  aggregate) with explicit double accumulation in array order, so the
  result is bit-deterministic and reproducible by the SQL oracle.
- ``brute_force_topk``: exact top-k via crossJoin + window rank — the
  correctness baseline. The query side is expected to be small and is
  broadcast; cost is O(|queries| × |corpus|) with no shuffle of the
  corpus.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic md5-derived hyperplanes), candidates = same-bucket
  pairs, exact cosine re-rank within buckets. Recall < 1 by design;
  at 100 TB this is the difference between a day and a minute.
- ``ivf_fit`` / ``ivf_assign`` / ``ivf_topk``: the other classic ANN
  index (IVF cell-probe, as in FAISS IVFFlat): a small centroid table
  partitions the corpus into cells; queries probe only their
  ``nprobe`` nearest cells. Centroids seed deterministically (vectors
  of the smallest ids — oracle-reproducible) and can be refined with
  distributed Lloyd iterations (``iters > 0``): assignment is a
  broadcast join + one partial-aggregation ``max_by``, the centroid
  update a posexplode + per-(cell,component) average — both
  shuffle-light and executor-count-scalable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_embeddings(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Symmetric per-vector INT8 quantization of an embedding column —
    the storage/IO lever for 100 TB embedding tables: int8 vectors are
    4x smaller than float32 on disk and over the network, and ANN
    re-ranking on dequantized values loses little recall at this
    precision. Map-only Column algebra, zero shuffle.

    Per vector: ``scale = 127 / max(|v|)`` (1.0 for all-zero vectors),
    ``q_i = clamp(round(v_i * scale), -127, 127)``. Output one row per
    vector: (id, q array<int>, scale, n_sat saturated components,
    recon_err = l2 of v - q/scale). Rounding is HALF-AWAY-FROM-ZERO on
    both engines (Spark HALF_UP == DuckDB round), and every fold runs
    in array order with double accumulation, so the quantized values
    are bit-reproducible by the SQL oracle."""
    out = df.select(F.col(id_col), F.col(vec_col).alias("__v"))
    amax = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax == 0, F.lit(1.0)).otherwise(F.lit(127.0) / amax)
    out = out.withColumn("__s", scale)
    q = F.transform(
        F.col("__v"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(x.cast("double") * F.col("__s")).cast("int")),
        ),
    )
    out = out.withColumn("q", q)
    recon = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("__v"),
                F.col("q"),
                lambda x, qq: F.pow(
                    x.cast("double") - qq.cast("double") / F.col("__s"), F.lit(2.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return out.select(
        id_col,
        "q",
        F.col("__s").alias("scale"),
        F.size(F.filter(F.col("q"), lambda x: F.abs(x) == 127)).alias("n_sat"),
        recon.alias("recon_err"),
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cos). Self-matches excluded.
    Ties broken by neighbor id for determinism. The queries side is
    broadcast — corpus never shuffles."""
    # Norms are HOISTED below the join (computed once per row, not once
    # per pair): cos = dot/(qn*cn) is the same arithmetic as cosine()
    # evaluated in the same operand order, so results are bit-identical
    # — but the interpreted HOF norm folds run O(|q|+|c|) times instead
    # of O(|q|·|c|) (guide §1.2 per-task work). The join boundary keeps
    # CollapseProject from inlining the norm back above the join.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5(plane_id, j):
    component j in {-1, +1}. Public trick: sign-random projections
    (Charikar SimHash for angles)."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane_id}:{j}".encode()).digest()[0]
        comps.append(1.0 if h % 2 == 0 else -1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-projection bucket id: bit p = 1 iff dot(vec, plane_p) >= 0."""
    out = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in hyperplane(dim, p)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        out = out + bit
    return out.cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, exact re-rank within.
    Same output schema as brute_force_topk; recall depends on n_planes
    (fewer planes → bigger buckets → higher recall, more compute)."""
    # norms hoisted below the bucket join — per row, not per candidate
    # pair; identical arithmetic/operand order as cosine() (see
    # brute_force_topk)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bkt"),
    )
    scored = (
        q.join(c, "bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ------------------------------------------------------------------- IVF


def ivf_fit(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    iters: int = 0,
) -> DataFrame:
    """Coarse quantizer for IVF: a small (cell_id, centroid) table.

    Seeds are the vectors of the ``n_cells`` smallest ids — fully
    deterministic, so the SQL oracle reproduces cell assignment
    bit-for-bit at ``iters=0``. ``iters > 0`` refines with distributed
    Lloyd steps (k-means): assign via broadcast-join ``max_by`` (one
    partial agg, no wide shuffle), update as posexplode →
    per-(cell, component) average → array re-assembly. A cell that
    loses all members keeps its previous centroid. The result is
    always ≤ n_cells rows — broadcast it everywhere.

    Determinism contract: each updated centroid component is rounded to
    9 decimals. avg() accumulates doubles in engine-dependent order, so
    unrounded centroids differ across engines in the ~1e-15 tail; the
    round pins them bit-identical, making the REFINED quantizer (not
    just the seed) reproducible by the SQL oracle."""
    centroids = (
        corpus.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(
            F.col(id_col).alias("__seed_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
        .withColumn(
            "cell_id",
            (F.row_number().over(Window.orderBy(F.col("__seed_id"))) - 1).cast("int"),
        )
        .select("cell_id", "centroid")
    )
    for _i in range(iters):
        assigned = ivf_assign(
            corpus.select(
                F.col(id_col).alias("__id"),
                F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
            ),
            centroids,
            "__v",
            "__id",
        )
        new = (
            assigned.select("cell_id", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cell_id", "pos")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
        empty = centroids.join(new, "cell_id", "left_anti")
        centroids = new.unionByName(empty)
    return centroids


def ivf_assign(
    df: DataFrame, centroids: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Assign each row to its nearest (max-cosine) cell. Broadcast the
    centroid table; the winner comes out of ONE partial-aggregation
    ``max_by`` keyed on the row id — the n×k score rows never shuffle.
    Ties (rounded cosine) break toward the smaller cell_id."""
    # row norm hoisted below the centroid cross join: computed once per
    # row instead of once per (row, centroid); same arithmetic/operand
    # order as cosine(), so assignment is bit-identical
    withn = df.withColumn("__vn", l2_norm(F.col(vec_col)))
    cent = centroids.withColumn("__cn", l2_norm(F.col("centroid")))
    scored = withn.crossJoin(F.broadcast(cent)).withColumn(
        "__cos",
        F.round(
            dot(F.col(vec_col), F.col("centroid")) / (F.col("__vn") * F.col("__cn")),
            6,
        ),
    )
    carry = [c for c in df.columns if c != id_col]
    return scored.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in carry],  # functionally dependent on id
        F.max_by(
            "cell_id", F.struct(F.col("__cos").alias("c"), (-F.col("cell_id")).alias("n"))
        ).alias("cell_id"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 5,
    iters: int = 0,
) -> DataFrame:
    """IVF cell-probe ANN: corpus rows live in their nearest cell;
    each query scans only its ``nprobe`` closest cells and exact-ranks
    within them. Same output schema as brute_force_topk; recall is
    governed by nprobe/n_cells. At scale the assigned corpus is
    materialized ONCE (the inverted file) and the probe is an equi-join
    on cell_id — the corpus shuffles by cell a single time, queries
    broadcast."""
    centroids = ivf_fit(corpus, vec_col, id_col, n_cells, iters=iters)
    c = ivf_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
        ),
        centroids,
        "cv",
        "neighbor_id",
    )
    # query/corpus norms hoisted below the joins (see brute_force_topk);
    # __qn rides the probe rows so the cell-probe scoring reuses it
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    ).withColumn("__qn", l2_norm(F.col("qv")))
    cn = c.withColumn("__cn", l2_norm(F.col("cv")))
    cent = centroids.withColumn("__ctn", l2_norm(F.col("centroid")))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "__cos",
            F.round(
                dot(F.col("qv"), F.col("centroid")) / (F.col("__qn") * F.col("__ctn")),
                6,
            ),
        )
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "qv", "__qn", "cell_id")
    )
    scored = (
        F.broadcast(probes)
        .join(cn, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
