"""SemDedup embedding-cluster dedup (operators/semdedup.py) vs a
numpy replay of the paper's upper-triangular rule, plus edge and plan
checks."""

import numpy as np
import pytest

from trustgraph_spark.operators.semdedup import semdedup

DIM = 8

# three well-separated unit-ish centroids
CENTS = [
    [1.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, -0.2, 0.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 1.0, 0.3, 0.0, 0.0],
]


def _mk_vectors():
    """Cluster-structured points with planted near-dup groups."""
    rng = np.random.RandomState(11)
    rows = []
    vid = 0
    for c in range(3):
        base = np.asarray(CENTS[c])
        for j in range(12):
            v = base + rng.randn(DIM) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
            if j % 4 == 0:  # plant a near-identical copy
                w = v + rng.randn(DIM) * 0.001
                rows.append((vid, [float(x) for x in w]))
                vid += 1
    return rows


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def py_semdedup(rows, cents, eps, keep):
    cent = np.asarray(cents, dtype=float)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    out = {}
    clusters = {}
    for vid, v in rows:
        m = np.asarray(v, dtype=float)
        n = np.linalg.norm(m)
        sims = (m / n if n else m) @ cent.T
        cid = int(sims.argmax())
        clusters.setdefault(cid, []).append((vid, v))
    for cid, items in clusters.items():
        sims = {vid: round(_cos(v, cents[cid]), 6) for vid, v in items}
        rev = keep == "near"
        ranked = sorted(items, key=lambda it: (
            -sims[it[0]] if rev else sims[it[0]], it[0]))
        for i, (vid, v) in enumerate(ranked):
            dropped = any(_cos(v, ranked[j][1]) >= eps for j in range(i))
            out[vid] = (cid, sims[vid], i + 1, not dropped)
    return out


@pytest.fixture(scope="module")
def vectors(spark):
    rows = _mk_vectors()
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"), rows


@pytest.mark.parametrize("keep", ["far", "near"])
def test_matches_numpy_replay(spark, vectors, keep):
    df, rows = vectors
    got = {r["vec_id"]: (r["cluster_id"], r["centroid_sim"],
                         r["csim_rank"], r["kept"])
           for r in semdedup(df, CENTS, eps=0.995, keep=keep).collect()}
    exp = py_semdedup(rows, CENTS, eps=0.995, keep=keep)
    assert set(got) == set(exp)
    for vid in exp:
        assert got[vid][0] == exp[vid][0], vid
        assert got[vid][1] == pytest.approx(exp[vid][1], abs=2e-6), vid
        assert got[vid][2] == exp[vid][2], vid
        assert got[vid][3] == exp[vid][3], vid


def test_planted_copies_are_deduped(spark, vectors):
    df, rows = vectors
    out = semdedup(df, CENTS, eps=0.995).collect()
    exp = py_semdedup(rows, CENTS, eps=0.995, keep="far")
    n_dropped = sum(1 for r in out if not r["kept"])
    # at least the 9 planted copies go (natural 0.05-noise neighbors may
    # add more — the replay is the exact contract)
    assert n_dropped == sum(1 for v in exp.values() if not v[3])
    assert n_dropped >= 9
    # every planted near-identical pair loses at least one member
    by_id = {r["vec_id"]: r["kept"] for r in out}
    vecs = dict(rows)
    for vid in vecs:
        if vid + 1 in vecs and _cos(vecs[vid], vecs[vid + 1]) >= 0.995:
            assert not (by_id[vid] and by_id[vid + 1]), vid


def test_eps_one_keeps_everything(spark, vectors):
    df, rows = vectors
    out = semdedup(df, CENTS, eps=1.0000001).collect()
    assert all(r["kept"] for r in out)
    assert len(out) == len(rows)


def test_bad_keep_raises(spark, vectors):
    df, _ = vectors
    with pytest.raises(ValueError):
        semdedup(df, CENTS, keep="middle")


def test_plan_no_cartesian(spark, vectors):
    df, _ = vectors
    out = semdedup(df, CENTS, eps=0.995)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # centroid join is broadcast; the pair test is a cluster-key equi-join
    assert "BroadcastHashJoin" in plan
