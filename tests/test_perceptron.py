"""Distributed integer batch-perceptron (extras/linalg.py
perceptron_train): exactness against a pure-numpy reference of the
same integer recurrence, and the property that makes the operator
worth shipping — the learned weights actually separate better than
epoch zero."""

import numpy as np
import pytest
from pyspark.sql import Row

from scio_sparql_spark.extras.linalg import perceptron_train


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(5)
    rows = []
    for i in range(120):
        label = i % 4
        # two separable-ish clouds: even labels shifted +0.4, odd -0.4
        shift = 0.4 if label % 2 == 0 else -0.4
        rows.append(
            Row(
                vec_id=i,
                embedding=[float(x + shift) for x in rng.randn(16)],
                label=label,
            )
        )
    return spark.createDataFrame(rows)


def _numpy_train(rows, dim, epochs, scale):
    X = np.array([r["embedding"][:dim] for r in rows])
    Q = (np.sign(X) * np.floor(np.abs(X) * scale + 0.5)).astype(np.int64)
    y = np.array([1 if r["label"] % 2 == 0 else -1 for r in rows], np.int64)
    w = np.zeros(dim, dtype=np.int64)
    for _ in range(epochs):
        mis = (y * (Q @ w)) <= 0
        w = w + (Q[mis] * y[mis, None]).sum(axis=0)
    return w, y, Q


def test_matches_numpy_reference(spark, emb):
    rows = emb.collect()
    for epochs in (1, 3):
        w_ref, _, _ = _numpy_train(rows, 16, epochs, 1000)
        got = {
            r["i"]: r["w"]
            for r in perceptron_train(
                emb, dim=16, epochs=epochs, scale=1000
            ).collect()
        }
        assert got == {i: int(w_ref[i]) for i in range(16)}, epochs


def test_training_reduces_misclassification(spark, emb):
    rows = emb.collect()
    w, y, Q = _numpy_train(rows, 16, 3, 1000)
    mis_trained = int((((Q @ w) * y) <= 0).sum())
    mis_zero = len(rows)  # w=0 misclassifies everything (margin 0)
    assert mis_trained < mis_zero / 3
    # and the distributed weights reproduce that accuracy, transitively
    got = perceptron_train(emb, dim=16, epochs=3, scale=1000).collect()
    w_spark = np.zeros(16, dtype=np.int64)
    for r in got:
        w_spark[r["i"]] = r["w"]
    assert (w_spark == w).all()


def test_epoch_zero_update_is_class_mean_direction(spark, emb):
    """w0 = 0 means every margin is 0 (<= 0), so epoch 1's update must
    be sum(y*q) over ALL rows — locks the documented edge semantics."""
    rows = emb.collect()
    w1 = {
        r["i"]: r["w"]
        for r in perceptron_train(emb, dim=16, epochs=1, scale=1000).collect()
    }
    X = np.array([r["embedding"][:16] for r in rows])
    Q = (np.sign(X) * np.floor(np.abs(X) * 1000 + 0.5)).astype(np.int64)
    y = np.array([1 if r["label"] % 2 == 0 else -1 for r in rows], np.int64)
    exp = (Q * y[:, None]).sum(axis=0)
    assert w1 == {i: int(exp[i]) for i in range(16)}
