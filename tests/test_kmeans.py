import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.data.multiset import (
    CITY_TO_CAMVID,
    AllDatasetsReader,
    MultiSetReader,
    translate_labels,
)
from mds_tpu.ops.kmeans import kmeans, pairwise_soft_dtw, soft_dtw


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.2, (40, 4)) + 5
    b = rng.normal(0, 0.2, (40, 4)) - 5
    x = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    centers, assign = kmeans(x, 2, jax.random.PRNGKey(0), n_iter=10)
    assign = np.asarray(assign)
    # each blob entirely in one cluster
    assert len(set(assign[:40])) == 1 and len(set(assign[40:])) == 1
    assert assign[0] != assign[40]


def test_kmeans_cosine():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (30, 8)), jnp.float32)
    centers, assign = kmeans(x, 3, jax.random.PRNGKey(1), distance="cosine")
    assert centers.shape == (3, 8) and assign.shape == (30,)


def np_soft_dtw(D, gamma):
    n, m = D.shape
    R = np.full((n + 1, m + 1), np.inf)
    R[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            z = -np.array([R[i - 1, j], R[i, j - 1], R[i - 1, j - 1]]) / gamma
            zmax = z.max()
            smin = -gamma * (np.log(np.exp(z - zmax).sum()) + zmax)
            R[i, j] = D[i - 1, j - 1] + smin
    return R[n, m]


def test_soft_dtw_matches_numpy_dp():
    rng = np.random.default_rng(2)
    D = rng.random((6, 9)).astype(np.float32)
    for gamma in (0.1, 1.0):
        want = np_soft_dtw(D.astype(np.float64), gamma)
        got = float(soft_dtw(jnp.asarray(D), gamma))
        assert abs(got - want) < 1e-3, (gamma, got, want)


def test_pairwise_soft_dtw_shape():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (4, 5, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 1, (2, 5, 3)), jnp.float32)
    d = pairwise_soft_dtw(x, c)
    assert d.shape == (4, 2)
    assert np.isfinite(np.asarray(d)).all()


def test_multiset_reader():
    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
        def __len__(self):
            return self.n
        def read(self, i, rng=None):
            return {"im": np.zeros((2, 2, 3), np.uint8), "lb": np.full((2, 2), i, np.uint8)}

    ms = MultiSetReader([Fake(3, "a"), Fake(5, "b")])
    assert len(ms) == 8
    s = ms.read(4)
    assert s["dataset_id"] == 1 and s["lb"][0, 0] == 1


def test_label_translation():
    lb = np.array([[0, 10, 13, 255, 3]], np.uint8)
    out = translate_labels(lb, CITY_TO_CAMVID)
    np.testing.assert_array_equal(out, [[3, 0, 8, 255, 255]])
