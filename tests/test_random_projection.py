"""JL +-1 random projection (extras/linalg.py): exactness against a
pure-numpy reference over the same replica-seeded planes, the
distance-preservation property that justifies the operator, and the
map-only plan shape."""

import numpy as np
import pytest
from pyspark.sql import Row

from scio_sparql_spark.extras.linalg import (
    projection_planes,
    random_projection_micro,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.randn(16)])
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


def test_matches_numpy_reference(spark, emb):
    planes = np.array(projection_planes(4, 16, seed=7), dtype=np.int64)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    got = {
        (r["vec_id"], r["j"]): r["y"]
        for r in random_projection_micro(
            emb, out_dim=4, dim=16, seed=7
        ).collect()
    }
    for vid, v in vecs.items():
        # the operator's quantize is round-half-away-from-zero
        q = np.floor(np.abs(v) * 1e6 + 0.5).astype(np.int64) * np.sign(v).astype(
            np.int64
        )
        y = planes @ q
        for j in range(4):
            assert got[(vid, j)] == y[j], (vid, j)


def test_planes_are_deterministic_and_distinct_from_lsh():
    a = projection_planes(4, 16, seed=7)
    assert a == projection_planes(4, 16, seed=7)
    assert all(s in (1, -1) for row in a for s in row)
    # the "rp:" salt means equal (seed, j, i) never reuses an LSH plane
    from scio_sparql_spark.extras.similarity import _hyperplanes

    lsh = _hyperplanes(None, 16, 4, 7)
    assert [[float(s) for s in row] for row in a] != lsh


def test_distance_preservation_envelope(spark, emb):
    """JL with +-1 planes: E[||y_a - y_b||^2 / dim'] = ||x_a - x_b||^2.
    Deterministic check (fixed planes, fixed data): the median ratio
    over all pairs must sit near 1 — documentation of the achieved
    distortion, not a flaky bound."""
    out_dim, dim = 8, 16
    proj = random_projection_micro(emb, out_dim=out_dim, dim=dim, seed=7)
    ys = {}
    for r in proj.collect():
        ys.setdefault(r["vec_id"], [0] * out_dim)[r["j"]] = r["y"]
    xs = {r["vec_id"]: np.array(r["embedding"]) * 1e6 for r in emb.collect()}
    ids = sorted(xs)
    ratios = []
    for a in range(0, len(ids), 3):
        for b in range(a + 1, len(ids), 5):
            dx = float(np.sum((xs[ids[a]] - xs[ids[b]]) ** 2))
            dy = float(
                np.sum((np.array(ys[ids[a]]) - np.array(ys[ids[b]])) ** 2)
            )
            ratios.append(dy / out_dim / dx)
    med = float(np.median(ratios))
    assert 0.5 < med < 2.0, med


def test_plan_is_map_only(spark, emb):
    plan = random_projection_micro(emb, out_dim=4, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
