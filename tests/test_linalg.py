"""Distributed Gram matrix + PCA whitening (extras/linalg.py)."""

import numpy as np
from pyspark.sql import functions as F

from scio_sparql_spark.extras.linalg import gram_matrix_micro, pca_whiten_micro


def _load(spark, dim=64):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.stack(
        [np.asarray(r["embedding"][:dim], dtype=np.float64) for r in df.collect()]
    )
    return df, X


def test_gram_matrix_equals_numpy_bignum_reference(spark):
    df, X = _load(spark)
    Q = (X * 1048576.0).astype(np.int64)
    ref = Q.T.astype(object) @ Q.astype(object)  # exact bignum reference
    got = {(r["i"], r["j"]): r["s"] for r in gram_matrix_micro(df, dim=64).collect()}
    assert len(got) == 64 * 64
    for i in range(64):
        for j in range(64):
            assert got[(i, j)] == int(ref[i, j]), (i, j)


def test_gram_matrix_partial_shuffle_is_tiny(spark):
    # the only shuffle is the dim^2-per-partition partials: the plan
    # must aggregate AFTER the Python map stage, never shuffle vectors
    df, _ = _load(spark)
    plan = (
        gram_matrix_micro(df, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    # exactly one exchange, and it carries (i, j, s) — not embeddings
    assert plan.count("Exchange") == 1
    ex = plan[plan.index("Exchange") :]
    assert "embedding" not in ex.split("MapInPandas")[0]


def test_pca_whiten_covariance_is_identity(spark):
    df, X = _load(spark)
    out = pca_whiten_micro(df, dim=64)
    Y = np.stack(
        [np.asarray(r["whitened"], dtype=np.float64) for r in out.collect()]
    )
    assert Y.shape == X.shape
    cov = np.cov(Y, rowvar=False, bias=True)
    # unit variance in every direction, no cross-correlation
    assert np.allclose(cov, np.eye(64), atol=1e-2), np.abs(cov - np.eye(64)).max()


def test_pca_whiten_preserves_ids(spark):
    df, _ = _load(spark)
    out = pca_whiten_micro(df, dim=64)
    assert out.select("vec_id").distinct().count() == df.count()
