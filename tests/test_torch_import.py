"""Torch checkpoint import round-trip + structural parity."""

import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.deploy.torch_import import bisenetv2_from_torch, bisenetv2_to_torch
from mds_tpu.models.bisenetv2 import BiSeNetV2

HW = 32


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def test_roundtrip_covers_all_params():
    model = BiSeNetV2(n_classes=(5, 7), n_bn=2)
    xs = [jnp.zeros((1, HW, HW, 3))] * 2
    v = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)}, xs, train=True
        )
    )(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, v["params"])
    stats = jax.tree_util.tree_map(np.asarray, v["batch_stats"])

    sd = bisenetv2_to_torch(params, stats)
    p2, s2 = bisenetv2_from_torch(sd, n_bn=2)

    fa, fb = _flatten(params), _flatten(p2)
    assert set(fa) == set(fb), (set(fa) - set(fb), set(fb) - set(fa))
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=k)
    sa, sb = _flatten(stats), _flatten(s2)
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_allclose(sa[k], sb[k], atol=1e-6, err_msg=k)


def test_imported_weights_run():
    model = BiSeNetV2(n_classes=(5,), n_bn=1, aux=False)
    xs = [jnp.zeros((1, HW, HW, 3))]
    v = jax.jit(lambda k: model.init({"params": k}, xs, train=False))(
        jax.random.PRNGKey(0)
    )
    sd = bisenetv2_to_torch(
        jax.tree_util.tree_map(np.asarray, v["params"]),
        jax.tree_util.tree_map(np.asarray, v["batch_stats"]),
    )
    p2, s2 = bisenetv2_from_torch(sd, n_bn=1, aux=False)
    logits = model.apply(
        {"params": p2, "batch_stats": s2},
        jnp.ones((1, HW, HW, 3)), dataset=0, method=model.eval_logits,
    )
    want = model.apply(v, jnp.ones((1, HW, HW, 3)), dataset=0,
                       method=model.eval_logits)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want), atol=1e-5)
