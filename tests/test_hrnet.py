import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models.hrnet import HRNET18_STAGES, HRNetBackbone, HRNetW48

HW = 64

# tiny stage dict: same structure (transitions, modules, fusion) at 1/12 the
# trace cost — tracing a full W18 costs ~60 s of the fast suite on this
# 1-core box; the HRNet reference-parity test covers real-weight parity
TINY_STAGES = {
    "stage2": dict(num_modules=1, num_branches=2, num_blocks=(1, 1),
                   num_channels=(4, 8)),
    "stage3": dict(num_modules=1, num_branches=3, num_blocks=(1, 1, 1),
                   num_channels=(4, 8, 16)),
    "stage4": dict(num_modules=1, num_branches=4, num_blocks=(1, 1, 1, 1),
                   num_channels=(4, 8, 16, 32)),
}


def test_hrnet_backbone_branch_shapes():
    model = HRNetBackbone(stages=TINY_STAGES, n_bn=2)
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    v = jax.eval_shape(
        lambda k: model.init(k, xs, train=False), jax.random.PRNGKey(0)
    )
    outs = jax.eval_shape(
        lambda v, a, b: model.apply(v, [a, b], train=False), v, xs[0], xs[1]
    )
    chans = TINY_STAGES["stage4"]["num_channels"]
    for bi, (branch, c) in enumerate(zip(outs, chans)):
        s = HW // 4 // (2**bi)
        assert branch[0].shape == (1, s, s, c), (bi, branch[0].shape)
        assert branch[1].shape == (1, s, s, c)


def test_hrnet_w48_model_shapes():
    model = HRNetW48(
        datasets_cats=(3, 4), output_feat_dim=32, unify_ratio=1.0,
        with_datasets_aux=True, n_bn=2, stages=TINY_STAGES,
    )
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    v = jax.eval_shape(
        lambda k: model.init(k, xs, train=True), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(
        lambda v, a, b: model.apply(v, [a, b], train=True,
                                    mutable=["batch_stats"])[0],
        v, xs[0], xs[1],
    )
    M = 7
    assert out["seg"][0].shape == (1, HW // 4, HW // 4, M)
    assert out["aux"][1].shape == (1, HW // 4, HW // 4, 4)
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=1, method=model.eval_logits),
        v, xs[0],
    )
    assert logits.shape == (1, HW // 4, HW // 4, 4)


def test_hrnet_forward_finite():
    model = HRNetW48(datasets_cats=(3,), output_feat_dim=16, n_bn=1,
                     stages=TINY_STAGES)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, HW, HW, 3)), jnp.float32)
    v = jax.jit(lambda k: model.init(k, [x], train=False))(jax.random.PRNGKey(0))
    feats = jax.jit(
        lambda v, x: model.apply(v, [x], train=False, method=model.features)[0]
    )(v, x)
    assert np.isfinite(np.asarray(feats)).all()
