"""IVF ANN (operators/similarity.py): the Lloyd-refinement path vs a
numpy reference, the empty-cell rule, and the exactness invariant
(probing every cell == brute force)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F, types as T

from audience_behavior_semantic_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_fit,
    ivf_topk,
)

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _vecs(rng: np.random.Generator, n: int, dim: int) -> list[list[float]]:
    return [[float(x) for x in rng.normal(size=dim)] for _ in range(n)]


def _numpy_ivf_fit(vecs: np.ndarray, n_cells: int, iters: int) -> np.ndarray:
    """Reference implementation of the same algorithm: seeds = first
    n_cells vectors (ids are 0..n-1 in order), cosine assignment with
    round-6 + smaller-cell tie-break, mean update, empty cell keeps its
    previous centroid."""
    cents = vecs[:n_cells].astype(float).copy()
    for _ in range(iters):
        cos = np.round(
            (vecs @ cents.T)
            / (np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]),
            6,
        )
        # argmax with smaller-index tie-break (np.argmax picks first max)
        assign = np.argmax(cos, axis=1)
        new = cents.copy()
        for c in range(n_cells):
            members = vecs[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = new
    return cents


def test_lloyd_iterations_match_numpy(spark):
    rng = np.random.default_rng(7)
    data = _vecs(rng, 40, 6)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], schema=VEC_SCHEMA
    )
    got = {
        r["cell_id"]: np.array(r["centroid"])
        for r in ivf_fit(df, "embedding", "vec_id", n_cells=4, iters=2).collect()
    }
    want = _numpy_ivf_fit(np.array(data), n_cells=4, iters=2)
    assert sorted(got) == [0, 1, 2, 3]
    for c in range(4):
        np.testing.assert_allclose(got[c], want[c], atol=1e-9)


def test_empty_cell_keeps_previous_centroid(spark):
    # two identical seed vectors: every [1,0]-ish point ties cells 0/1
    # and the tie-break sends all of them to cell 0 -> cell 1 empties
    data = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.9, 0.1]),
        (4, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(data, schema=VEC_SCHEMA)
    cents = {
        r["cell_id"]: list(r["centroid"])
        for r in ivf_fit(df, "embedding", "vec_id", n_cells=3, iters=1).collect()
    }
    assert cents[1] == [1.0, 0.0], "empty cell must keep its previous centroid"
    assert len(cents) == 3


def test_probe_all_cells_equals_brute_force(spark):
    rng = np.random.default_rng(3)
    data = _vecs(rng, 60, 8)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], schema=VEC_SCHEMA)
    qs = df.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(qs, df, "embedding", "vec_id", k=3).toPandas()
    ivf = ivf_topk(
        qs, df, "embedding", "vec_id", n_cells=4, nprobe=4, k=3, iters=1
    ).toPandas()
    cols = ["query_id", "neighbor_id", "rank"]
    assert (
        exact[cols].sort_values(cols).reset_index(drop=True).equals(
            ivf[cols].sort_values(cols).reset_index(drop=True)
        )
    ), "nprobe == n_cells must reduce IVF to exact search"


def test_partial_probe_recall_reasonable(spark):
    rng = np.random.default_rng(11)
    data = _vecs(rng, 200, 8)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(data)], schema=VEC_SCHEMA)
    qs = df.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(qs, df, "embedding", "vec_id", k=5).toPandas()
    ivf = ivf_topk(qs, df, "embedding", "vec_id", n_cells=8, nprobe=4, k=5).toPandas()
    want = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    got = set(map(tuple, ivf[["query_id", "neighbor_id"]].values))
    recall = len(want & got) / len(want)
    assert recall >= 0.3, f"nprobe=4/8 recall collapsed: {recall}"
