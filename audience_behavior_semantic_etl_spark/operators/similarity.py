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
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
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
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bkt"),
    )
    scored = (
        q.join(c, "bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
