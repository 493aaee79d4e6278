"""Per-pixel sinkhorn prototype assignment parity vs the reference.

Golden vs /root/reference/lib/prototype_learning.py:11-77 +
lib/sinkhorn.py:5-28 (`distributed_sinkhorn`). The only stochastic op in the
reference path is the final `F.gumbel_softmax(L, 0.5, hard=True)`; both sides
run its zero-noise limit (hard argmax one-hot) so the comparison is exact —
gumbel noise is covered by a jax-only statistical test below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mds_tpu.ops.prototype_learning import (
    grouped_sinkhorn,
    hard_assignment,
    prototype_learning,
)

K, P, D = 7, 4, 16


def _fixture(seed=0, N=400, ignore_frac=0.15):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    protos = rng.normal(size=(K, P, D)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    gt = rng.integers(0, K, size=N).astype(np.int64)
    gt[rng.random(N) < ignore_frac] = 255
    gt[:3] = 6  # class 5 left empty below: skip-branch coverage
    gt[gt == 5] = 255
    correct = rng.random(N) < 0.6
    return emb, protos, gt, correct


def _run_reference(emb, protos, gt, correct, update=True, coefficient=0.9):
    torch = pytest.importorskip("torch")
    import sys
    import types

    from test_reference_parity import _stub, evict_stubs

    # other parity tests stub these names (they only need the AdvGNN loss's
    # import graph to resolve); here the REAL modules are the golden
    evict_stubs("lib.sinkhorn", "lib.prototype_learning", "lib.module.kmeans",
                "lib.module.soft_dtw_cuda")

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", trunc_normal_=torch.nn.init.trunc_normal_)
    # lib.prototype_learning imports lib.module.kmeans → soft_dtw_cuda → numba
    _stub(
        "numba",
        jit=lambda *a, **k: (a[0] if a and callable(a[0])
                             else (lambda f: f)),
        cuda=types.SimpleNamespace(
            jit=lambda *a, **k: (lambda f: f),
        ),
    )
    _stub("numba.cuda", jit=lambda *a, **k: (lambda f: f))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib

    sk = importlib.import_module("lib.sinkhorn")
    pl = importlib.import_module("lib.prototype_learning")

    class Cfg:
        def get(self, *keys):
            return {
                ("num_unify_classes",): K,
                ("contrast", "num_prototype"): P,
                ("contrast", "coefficient"): coefficient,
                ("network", "stride"): 1,
            }[keys]

    # zero-noise gumbel: deterministic hard argmax (same limit as ours)
    def det_gumbel(logits, tau=1.0, hard=True, **kw):
        idx = logits.argmax(dim=1)
        return torch.nn.functional.one_hot(idx, logits.shape[1]).float()

    real = sk.F.gumbel_softmax
    sk.F.gumbel_softmax = det_gumbel
    try:
        N = emb.shape[0]
        # out_seg drives only `pred_seg` (argmax) → synthesize logits whose
        # argmax equals gt exactly where `correct`, else (gt+1)%K
        pred = np.where(correct, np.where(gt == 255, 0, gt),
                        (np.where(gt == 255, 0, gt) + 1) % K)
        out_seg = np.full((1, K, 1, N), -10.0, np.float32)
        out_seg[0, pred, 0, np.arange(N)] = 10.0
        logits, target, protos_new = pl.prototype_learning(
            Cfg(),
            torch.from_numpy(protos),
            torch.from_numpy(emb),
            torch.from_numpy(out_seg),
            torch.from_numpy(gt),
            update_prototype=update,
        )
        return (logits.numpy(), target.numpy(), protos_new.numpy(),
                pred)
    finally:
        sk.F.gumbel_softmax = real


def test_prototype_learning_torch_golden():
    emb, protos, gt, correct = _fixture()
    t_logits, t_target, t_protos, pred = _run_reference(
        emb, protos, gt, correct, update=True, coefficient=0.9)

    ours = prototype_learning(
        jnp.asarray(protos), jnp.asarray(emb), jnp.asarray(gt),
        jnp.asarray(pred == gt), update_prototype=True, coefficient=0.9,
        rng=None,
    )
    np.testing.assert_allclose(np.asarray(ours.proto_logits), t_logits,
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours.proto_target), t_target)
    np.testing.assert_allclose(np.asarray(ours.prototypes), t_protos,
                               atol=1e-5, rtol=1e-5)
    # the empty class (5) and ignore pixels really exercised their branches
    assert not np.any(gt == 5)
    assert np.any(gt == 255)
    np.testing.assert_allclose(np.asarray(ours.prototypes)[5], protos[5])
    assert np.all(np.asarray(ours.proto_target)[gt == 255] == 255)


def test_prototype_learning_no_update_keeps_protos():
    emb, protos, gt, correct = _fixture(seed=1)
    ours = prototype_learning(
        jnp.asarray(protos), jnp.asarray(emb), jnp.asarray(gt),
        jnp.asarray(correct), update_prototype=False)
    np.testing.assert_allclose(np.asarray(ours.prototypes), protos)
    t_logits, t_target, _, pred = _run_reference(
        emb, protos, gt, correct, update=False)
    ours2 = prototype_learning(
        jnp.asarray(protos), jnp.asarray(emb), jnp.asarray(gt),
        jnp.asarray(pred == gt), update_prototype=False)
    np.testing.assert_array_equal(np.asarray(ours2.proto_target), t_target)


def test_grouped_sinkhorn_balances_within_class():
    """Sinkhorn's point: per-class slot masses even out (vs raw argmax)."""
    rng = np.random.default_rng(3)
    N = 4096
    scores = rng.normal(size=(N, P)).astype(np.float32)
    scores[:, 0] += 2.0  # heavy argmax skew toward slot 0
    gt = rng.integers(0, K, size=N)
    q, idx = grouped_sinkhorn(
        jnp.asarray(scores), jnp.asarray(gt), K,
        valid=jnp.ones(N, bool))
    idx = np.asarray(idx)
    counts = np.bincount(idx, minlength=P)
    # raw argmax sends ~86% of pixels to slot 0; sinkhorn must spread them
    raw = np.bincount(scores.argmax(1), minlength=P)
    assert raw[0] > 0.8 * N
    assert counts[0] < 0.5 * N
    assert counts.min() > 0.05 * N
    # transport rows of valid pixels carry mass
    assert float(jnp.sum(q)) > 0


def test_hard_assignment_gumbel_statistics():
    """With rng, assignment samples argmax(q + gumbel)/tau — near-uniform
    for uniform q, concentrated for peaked q."""
    q = jnp.ones((2000, P)) / P
    oh = hard_assignment(q, rng=jax.random.PRNGKey(0))
    counts = np.asarray(oh.sum(0))
    assert counts.min() > 2000 / P * 0.7
    q2 = jnp.zeros((2000, P)).at[:, 1].set(5.0)
    oh2 = hard_assignment(q2, rng=jax.random.PRNGKey(1))
    assert float(oh2[:, 1].mean()) > 0.95


def test_prototype_learning_jit_and_grad_safe():
    """The op must live inside the jitted contrast step: jit-compiles, and
    proto_logits carries gradient to the embedding."""
    emb, protos, gt, correct = _fixture(seed=2, N=128)

    @jax.jit
    def f(emb):
        r = prototype_learning(
            jnp.asarray(protos), emb, jnp.asarray(gt), jnp.asarray(correct))
        return (r.proto_logits ** 2).mean(), r.prototypes

    (val, protos_new), g = jax.value_and_grad(f, has_aux=True)(
        jnp.asarray(emb))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
