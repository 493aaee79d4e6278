"""Fast stem convs: exact parity with the plain stride-2 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.ops.space_to_depth import (
    conv3x3_s2_via_planes,
    conv3x3_s2_via_s2d,
    space_to_depth_2x2,
)


def plain_s2(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("impl", [conv3x3_s2_via_s2d, conv3x3_s2_via_planes])
@pytest.mark.parametrize("c_in,c_out", [(3, 64), (3, 16), (4, 8)])
def test_fast_stem_matches_plain(impl, c_in, c_out):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, c_in)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, c_in, c_out)), jnp.float32)
    want = np.asarray(plain_s2(x, k))
    got = np.asarray(impl(x, k))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = space_to_depth_2x2(x)
    assert y.shape == (2, 2, 2, 12)
    # channel layout (p, q, c): block (u,v), offset (p,q), channel c
    np.testing.assert_array_equal(
        np.asarray(y[0, 1, 0]),
        np.asarray(
            jnp.stack([x[0, 2 + p, 0 + q] for p in (0, 1) for q in (0, 1)]).reshape(-1)
        ),
    )


@pytest.mark.parametrize("impl_name", ["planes", "s2d"])
def test_stem_conv_module_param_layout_and_fallback(impl_name):
    """ConvBNReLU stride-2 3ch path keeps nn.Conv's param tree, matches the
    plain conv, and odd spatial sizes fall back without shape errors."""
    from mds_tpu.models import layers
    from mds_tpu.models.layers import ConvBNReLU

    layers.set_stem_impl(impl_name)
    try:
        m = ConvBNReLU(16, ks=3, stride=2, n_bn=1)
        x = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (1, 16, 16, 3)), jnp.float32
        )
        v = m.init(jax.random.PRNGKey(0), [x], train=False)
        assert v["params"]["conv"]["kernel"].shape == (3, 3, 3, 16)
        (y,) = m.apply(v, [x], train=False)
        assert y.shape == (1, 8, 8, 16)

        x_odd = jnp.ones((1, 15, 17, 3), jnp.float32)
        (y_odd,) = m.apply(v, [x_odd], train=False)
        assert y_odd.shape == (1, 8, 9, 16)
    finally:
        layers.set_stem_impl("plain")


def test_stem_conv_grad_bf16():
    """bf16 training through the planes stem path must be differentiable."""
    from mds_tpu.models import layers
    from mds_tpu.models.layers import ConvBNReLU

    layers.set_stem_impl("planes")  # explicitly select the path under test
    m = ConvBNReLU(16, ks=3, stride=2, n_bn=1, dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 3), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)

    def loss(params):
        (y,) = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                       [x], train=False)
        return jnp.sum(y.astype(jnp.float32))

    try:
        g = jax.grad(loss)(v["params"])
        leaf = jax.tree_util.tree_leaves(g)[0]
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    finally:
        layers.set_stem_impl("plain")


def test_fused_stem_bn_relu_matches_separate():
    """Eval-mode ConvBNReLU folds BN(+ReLU) into the stem conv; the fused
    output must match conv->BN->ReLU (within one bf16 rounding)."""
    from mds_tpu.models import layers
    from mds_tpu.models.layers import ConvBNReLU

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 24, 3)), jnp.bfloat16)
    m = ConvBNReLU(16, ks=3, stride=2, n_bn=1, dtype=jnp.bfloat16)
    layers.set_stem_impl("plain")
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    v = jax.tree_util.tree_map(np.asarray, v)
    v["batch_stats"]["bn"]["mean"] = rng.normal(0, 0.1, (1, 16)).astype(np.float32)
    v["batch_stats"]["bn"]["var"] = rng.uniform(0.5, 1.5, (1, 16)).astype(np.float32)
    v["params"]["bn"]["scale"] = rng.normal(1, 0.1, (16,)).astype(np.float32)
    v["params"]["bn"]["bias"] = rng.normal(0, 0.1, (16,)).astype(np.float32)
    (want,) = m.apply(v, [x], train=False)
    try:
        for impl in ("pallas", "planes"):
            layers.set_stem_impl(impl)
            (got,) = m.apply(v, [x], train=False)
            err = np.abs(
                np.asarray(got, np.float32) - np.asarray(want, np.float32)
            ).max()
            assert err < 0.05, (impl, err)
            assert (np.asarray(got, np.float32) >= 0).all()  # ReLU applied
    finally:
        layers.set_stem_impl("plain")


def test_stem_dma_variant_matches_tiles():
    """The in-kernel-DMA stem variant must agree with the stacked-tiles
    default (both interpret-mode on CPU: dma falls back to tiles there, so
    just assert the selection plumbing works and output matches)."""
    from mds_tpu.ops.pallas import stem as stem_mod

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 32, 3)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 3, 8)), jnp.float32)
    s = jnp.ones(8, jnp.float32)
    b = jnp.zeros(8, jnp.float32)
    want = np.asarray(stem_mod.stem_conv_bn_relu_s2(x, k, s, b), np.float32)
    stem_mod.set_stem_variant("dma")
    try:
        got = np.asarray(stem_mod.stem_conv_bn_relu_s2(x, k, s, b), np.float32)
    finally:
        stem_mod.set_stem_variant("tiles")
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_stem_s1_pair_fused_matches_chain():
    """Fused S1_1+S1_2 pair kernel (deploy path) vs the XLA two-conv chain
    with folded BNs — interpret mode on CPU."""
    from mds_tpu.ops.pallas.stem import stem_s1_pair_fused

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 3)), jnp.bfloat16)
    k1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 64)), jnp.float32)
    s1 = jnp.asarray(rng.normal(1, 0.1, (64,)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    k2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.float32)
    s2 = jnp.asarray(rng.normal(1, 0.1, (64,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)

    def conv(x, k, stride):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    y1 = jnp.maximum(conv(x, k1, 2) * s1 + b1, 0).astype(jnp.bfloat16)
    want = jnp.maximum(conv(y1, k2, 1) * s2 + b2, 0).astype(jnp.bfloat16)
    got = stem_s1_pair_fused(x, k1, s1, b1, k2, s2, b2, interpret=True)
    assert got.shape == want.shape == (2, 16, 24, 64)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 0.1, err.max()  # one extra bf16 rounding allowed
    # exactness check in relative terms against the magnitude
    rel = err.max() / max(np.abs(np.asarray(want, np.float32)).max(), 1)
    assert rel < 2e-2, rel


def test_stemblock_fused_matches_chain():
    """Fully fused StemBlock kernel vs the XLA chain (stem conv → left 1×1 →
    left 3×3 s2 ‖ maxpool → concat → fuse conv), folded BNs — interpret
    mode on CPU."""
    import flax.linen as fnn

    from mds_tpu.ops.pallas.stem import stemblock_fused

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 3)), jnp.bfloat16)

    def mk(shape, s=0.2):
        return jnp.asarray(rng.normal(0, s, shape), jnp.float32)

    k_s, k_l1 = mk((3, 3, 3, 16)), mk((1, 1, 16, 8), 0.3)
    k_l2, k_f = mk((3, 3, 8, 16)), mk((3, 3, 32, 16))
    sc = lambda n: jnp.asarray(rng.normal(1, 0.1, (n,)), jnp.float32)
    bi = lambda n: jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    s_s, b_s, s_l1, b_l1 = sc(16), bi(16), sc(8), bi(8)
    s_l2, b_l2, s_f, b_f = sc(16), bi(16), sc(16), bi(16)

    def conv(x, k, stride, pad=1):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    def cbr(x, k, s, b, stride=1, pad=1):
        return jnp.maximum(conv(x, k, stride, pad) * s + b, 0).astype(
            jnp.bfloat16
        )

    stem = cbr(x, k_s, s_s, b_s, 2)
    left = cbr(cbr(stem, k_l1, s_l1, b_l1, 1, 0), k_l2, s_l2, b_l2, 2)
    right = fnn.max_pool(stem, (3, 3), strides=(2, 2),
                         padding=[(1, 1), (1, 1)])
    want = cbr(jnp.concatenate([left, right], -1), k_f, s_f, b_f, 1)
    got = stemblock_fused(x, k_s, s_s, b_s, k_l1, s_l1, b_l1,
                          k_l2, s_l2, b_l2, k_f, s_f, b_f, interpret=True)
    assert got.shape == want.shape == (2, 8, 12, 16)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 0.1, err.max()


def test_stemblock_fuse_module_matches_unfused():
    """StemBlock with set_detail_fuse(True) equals the plain eval path."""
    from mds_tpu.models import layers
    from mds_tpu.models.bisenetv2 import StemBlock

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)), jnp.bfloat16)
    m = StemBlock(n_bn=1, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    v = jax.tree_util.tree_map(np.asarray, v)
    for name in ("conv", "left_1", "left_2", "fuse"):
        n = v["batch_stats"][name]["bn"]["mean"].shape[-1]
        v["batch_stats"][name]["bn"]["mean"] = rng.normal(
            0, 0.1, (1, n)).astype(np.float32)
        v["batch_stats"][name]["bn"]["var"] = rng.uniform(
            0.5, 1.5, (1, n)).astype(np.float32)
    (want,) = m.apply(v, [x], train=False)
    layers.set_detail_fuse(True)
    try:
        (got,) = m.apply(v, [x], train=False)
    finally:
        layers.set_detail_fuse(False)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert err.max() < 0.1, err.max()


@pytest.mark.parametrize("h", [32, 64])
def test_detail_fuse_branch_matches_unfused(h):
    """DetailBranch with set_detail_fuse(True) equals the plain eval path.
    h=32 exercises the S1-pair kernel + XLA tail (the tail-fusion guard
    rejects h/4 % 16 != 0); h=64 routes S2_2…S3_3 through
    detail_tail_fused too."""
    from mds_tpu.models import layers
    from mds_tpu.models.bisenetv2 import DetailBranch

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (1, h, 32, 3)), jnp.bfloat16)
    m = DetailBranch(n_bn=1, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    v = jax.tree_util.tree_map(np.asarray, v)
    # non-trivial BN stats on the fused convs
    for name in ("S1_1", "S1_2", "S2_2", "S3_1", "S3_3"):
        n = v["batch_stats"][name]["bn"]["mean"].shape[-1]
        v["batch_stats"][name]["bn"]["mean"] = rng.normal(
            0, 0.1, (1, n)).astype(np.float32)
        v["batch_stats"][name]["bn"]["var"] = rng.uniform(
            0.5, 1.5, (1, n)).astype(np.float32)
    (want,) = m.apply(v, [x], train=False)
    layers.set_detail_fuse(True)
    layers.set_detail_tail(True)  # measured-negative default is off
    try:
        (got,) = m.apply(v, [x], train=False)
    finally:
        layers.set_detail_fuse(False)
        layers.set_detail_tail(False)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    # h=64 chains 8 convs with different bf16-rounding points — judge the
    # deep case relative to the activation magnitude instead
    if h == 32:
        assert err.max() < 0.1, err.max()
    else:
        rel = err.max() / max(np.abs(np.asarray(want, np.float32)).max(), 1)
        assert rel < 2e-2, (err.max(), rel)


def test_stem7_matches_conv_chain():
    """Fused 7×7/s2 stem kernel vs XLA conv + folded BN + ReLU — interpret
    mode on CPU (two row tiles, odd-ish widths)."""
    from mds_tpu.ops.pallas.stem import stem7_conv_bn_relu_s2

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(0, 1, (2, 36, 44, 3)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 0.15, (7, 7, 3, 64)), jnp.float32)
    s = jnp.asarray(rng.normal(1, 0.1, (64,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)

    conv = jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    want = jnp.maximum(conv * s + b, 0).astype(jnp.bfloat16)
    got = stem7_conv_bn_relu_s2(x, k, s, b, th=4, interpret=True)
    assert got.shape == want.shape == (2, 18, 22, 64)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    rel = err.max() / max(np.abs(np.asarray(want, np.float32)).max(), 1)
    assert rel < 1e-2, (err.max(), rel)


def test_resnet18_stem_fuse_matches_plain():
    """Resnet18 eval with set_stem_impl('pallas') equals the plain path and
    leaves the param tree unchanged (BNFold/_ConvKernelHolder layout)."""
    from mds_tpu.models import layers
    from mds_tpu.models.resnet import Resnet18

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 48, 3)), jnp.bfloat16)
    m = Resnet18(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    v = jax.tree_util.tree_map(np.asarray, v)
    v["batch_stats"]["bn1"]["mean"] = rng.normal(0, 0.1, (64,)).astype(
        np.float32)
    v["batch_stats"]["bn1"]["var"] = rng.uniform(0.5, 1.5, (64,)).astype(
        np.float32)
    want = m.apply(v, x, train=False)
    layers.set_stem_impl("pallas")
    try:
        v2 = m.init(jax.random.PRNGKey(0), x, train=False)
        # fused init must produce the same tree as the plain init
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(v)
        got = m.apply(v, x, train=False)
    finally:
        layers.set_stem_impl("plain")
    for g, w in zip(got, want):
        gw = np.asarray(w, np.float32)
        err = np.abs(np.asarray(g, np.float32) - gw)
        rel = err.max() / max(np.abs(gw).max(), 1)
        assert rel < 2e-2, (err.max(), rel)


def test_bisenetv1_stem_fuse_matches_plain():
    """BiSeNetV1 bf16 eval with set_stem_impl('pallas') (both 7×7 RGB stems
    — ResNet conv1 + SpatialPath conv1 — through the fused kernel) equals
    the plain path; param tree unchanged."""
    from mds_tpu.models import layers
    from mds_tpu.models.bisenetv1 import BiSeNetV1

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)), jnp.bfloat16)
    m = BiSeNetV1(n_classes=(19,), aux=False, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    want = m.apply(v, x, dataset=0, method=m.pred)
    layers.set_stem_impl("pallas")
    try:
        v2 = m.init(jax.random.PRNGKey(0), [x], train=False)
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(v)
        got = m.apply(v, x, dataset=0, method=m.pred)
        logits_f = m.apply(v, x, dataset=0, method=m.eval_logits)
    finally:
        layers.set_stem_impl("plain")
    logits_p = m.apply(v, x, dataset=0, method=m.eval_logits)
    # random weights make many argmax near-ties; judge the logits
    # relatively and the label map loosely
    lw = np.asarray(logits_p, np.float32)
    rel = np.abs(np.asarray(logits_f, np.float32) - lw).max() / max(
        np.abs(lw).max(), 1
    )
    assert rel < 2e-2, rel
    agree = (np.asarray(got) == np.asarray(want)).mean()
    assert agree > 0.97, agree


def test_swiftnet_stem_fuse_matches_plain():
    """SwiftNet pyramid bf16 eval with set_stem_impl('pallas') (the
    per-level 7×7 stem + folded SharedListBN slot affine) equals the plain
    path; param tree unchanged."""
    from mds_tpu.models import layers
    from mds_tpu.models.swiftnet import SwiftNetPyramid

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)), jnp.bfloat16)
    m = SwiftNetPyramid(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    v = jax.tree_util.tree_map(np.asarray, v)
    v["batch_stats"]["bn1"]["mean"] = rng.normal(
        0, 0.1, v["batch_stats"]["bn1"]["mean"].shape).astype(np.float32)
    v["batch_stats"]["bn1"]["var"] = rng.uniform(
        0.5, 1.5, v["batch_stats"]["bn1"]["var"].shape).astype(np.float32)
    (want,) = m.apply(v, [x], train=False)
    layers.set_stem_impl("pallas")
    try:
        v2 = m.init(jax.random.PRNGKey(0), [x], train=False)
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(v)
        (got,) = m.apply(v, [x], train=False)
    finally:
        layers.set_stem_impl("plain")
    gw = np.asarray(want, np.float32)
    err = np.abs(np.asarray(got, np.float32) - gw)
    rel = err.max() / max(np.abs(gw).max(), 1)
    assert rel < 2e-2, (err.max(), rel)


def test_detail_tail_fused_matches_chain():
    """Fused detail-tail kernel (S2_2→S2_3→S3_1 s2→S3_2→S3_3) vs the XLA
    five-conv chain with folded BNs — interpret mode on CPU. Two row tiles
    so the inter-tile halo and edge-zeroing paths are exercised."""
    from mds_tpu.ops.pallas.stem import detail_tail_fused

    rng = np.random.default_rng(21)
    y = jnp.asarray(rng.normal(0, 1, (2, 32, 20, 64)), jnp.bfloat16)

    def mk(shape, s=0.1):
        return jnp.asarray(rng.normal(0, s, shape), jnp.float32)

    ks = [mk((3, 3, 64, 64)), mk((3, 3, 64, 64)), mk((3, 3, 64, 128)),
          mk((3, 3, 128, 128)), mk((3, 3, 128, 128))]
    scs = [jnp.asarray(rng.normal(1, 0.1, (k.shape[-1],)), jnp.float32)
           for k in ks]
    bis = [jnp.asarray(rng.normal(0, 0.1, (k.shape[-1],)), jnp.float32)
           for k in ks]

    def conv(x, k, stride):
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    want = y
    for k, s, b, stride in zip(ks, scs, bis, (1, 1, 2, 1, 1)):
        want = jnp.maximum(conv(want, k, stride) * s + b, 0).astype(
            jnp.bfloat16
        )
    got = detail_tail_fused(
        y, ks[0], scs[0], bis[0], ks[1], scs[1], bis[1],
        ks[2], scs[2], bis[2], ks[3], scs[3], bis[3],
        ks[4], scs[4], bis[4], interpret=True,
    )
    assert got.shape == want.shape == (2, 16, 10, 128)
    w = np.asarray(want, np.float32)
    err = np.abs(np.asarray(got, np.float32) - w)
    # five chained convs grow activations to ~150; 1 bf16 ulp there is 1.0 —
    # judge relative to the activation magnitude (measured rel ≈ 8e-3)
    rel = err.max() / max(np.abs(w).max(), 1)
    assert rel < 2e-2, (err.max(), rel)
