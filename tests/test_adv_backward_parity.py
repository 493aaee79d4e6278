"""Adv-mode backward parity (VERDICT r3 next #8: "separate the adv D-step
backward or prove equivalence").

The reference's LIVE adv path is a SINGLE backward: `backward_loss +=
adv_loss; scaler.scale(backward_loss).backward(); scaler.step(gnn_optim);
scaler.step(gnn_optimD)` (tools/train_ltbgnn_all_datasets_snp.py:947-965 —
the separate retain-graph D-backward is the commented-out block :949-953).
Under that live path the discriminator gradient is

    dθD [ BCE(D(real.sg), 0) + BCE(D(fake.sg), 1) ]        (the D loss)
  + adv_loss_weight · dθD [ BCE(D(fake), 0) ]               (the G-term leak)

because the generator's fooling term g_out_fake = netD(fake) is NOT detached
w.r.t. netD (lib/models/graph_attention_network.py:978-1016 detaches the
features, not the discriminator). Our jitted gnn step reproduces exactly
this: one jax.grad over loss + metrics['adv_loss'] (engine/gnn_trainer.py).

This test mirrors the structure with a 1-layer generator + sigmoid-MLP
discriminator on both sides (identical weights) and asserts the torch
combined-backward gradients equal the jax combined-grad gradients for BOTH
parameter sets — including the leak term (checked to be nonzero)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, D_IN, D_H = 12, 8, 6
ADV_W = 1.0


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "g": rng.normal(size=(D_IN, D_IN)).astype(np.float32) * 0.3,
        "d1": rng.normal(size=(D_IN, D_H)).astype(np.float32) * 0.3,
        "d2": rng.normal(size=(D_H, 1)).astype(np.float32) * 0.3,
        "x": rng.normal(size=(N, D_IN)).astype(np.float32),
    }


def test_combined_backward_gradients_match_torch():
    w = _weights()

    # ---------------- torch: the reference's live combined backward --------
    g = torch.nn.Parameter(torch.from_numpy(w["g"]))
    d1 = torch.nn.Parameter(torch.from_numpy(w["d1"]))
    d2 = torch.nn.Parameter(torch.from_numpy(w["d2"]))
    x = torch.from_numpy(w["x"])

    def netD(h):
        return torch.sigmoid(torch.relu(h @ d1) @ d2)

    bce = torch.nn.BCELoss()
    real, fake = x, x @ g
    # model-side detach pattern (graph_attention_network.py:978-1016)
    out_real = netD(real.detach())
    out_fake = netD(fake.detach())
    g_out_fake = netD(fake)
    zeros = torch.zeros(N, 1)
    ones = torch.ones(N, 1)
    # label_real = ZEROS, label_fake = ONES (loss_cross_datasets.py:926-927)
    G_term = bce(g_out_fake, zeros)
    adv_loss = bce(out_real, zeros) + bce(out_fake, ones)
    backward_loss = ADV_W * G_term + adv_loss  # :947 backward_loss += adv_loss
    backward_loss.backward()
    t_g_grad = g.grad.numpy()
    t_d1_grad = d1.grad.numpy()
    t_d2_grad = d2.grad.numpy()

    # the leak is real: D-grad from the G term alone is nonzero
    g2 = torch.nn.Parameter(torch.from_numpy(w["g"]))
    d1b = torch.nn.Parameter(torch.from_numpy(w["d1"]))
    d2b = torch.nn.Parameter(torch.from_numpy(w["d2"]))
    leak = ADV_W * torch.nn.BCELoss()(
        torch.sigmoid(torch.relu((x @ g2) @ d1b) @ d2b), zeros)
    leak.backward()
    assert np.abs(d1b.grad.numpy()).sum() > 0

    # ---------------- jax: our gnn_step shape (one grad over loss + adv) ---
    eps = 1e-7  # losses/cross_datasets.py bce clamp

    def jbce(p, y):
        return -jnp.mean(y * jnp.log(p + eps) + (1 - y) * jnp.log(1 - p + eps))

    def total(params):
        xj = jnp.asarray(w["x"])
        fake = xj @ params["g"]

        def netDj(h):
            return jax.nn.sigmoid(
                jax.nn.relu(h @ params["d1"]) @ params["d2"])

        out_real = netDj(jax.lax.stop_gradient(xj))
        out_fake = netDj(jax.lax.stop_gradient(fake))
        g_out_fake = netDj(fake)
        g_term = jbce(g_out_fake, 0.0)
        adv = jbce(out_real, 0.0) + jbce(out_fake, 1.0)
        return ADV_W * g_term + adv  # gnn_trainer: loss + metrics['adv_loss']

    grads = jax.grad(total)(
        {k: jnp.asarray(w[k]) for k in ("g", "d1", "d2")})

    np.testing.assert_allclose(np.asarray(grads["g"]), t_g_grad,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["d1"]), t_d1_grad,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads["d2"]), t_d2_grad,
                               atol=1e-5, rtol=1e-4)
    # and the combined D-grad really differs from the pure-D-loss grad
    # (i.e. the single-backward semantics we reproduce are NOT the separated
    # variant; if the reference ever un-comments :949-953, flip this)
    d_only = jax.grad(
        lambda p: jbce(
            jax.nn.sigmoid(jax.nn.relu(
                jax.lax.stop_gradient(jnp.asarray(w["x"]) @ p["g"])
                @ p["d1"]) @ p["d2"]), 1.0)
        + jbce(jax.nn.sigmoid(jax.nn.relu(
            jnp.asarray(w["x"]) @ p["d1"]) @ p["d2"]), 0.0)
    )({k: jnp.asarray(w[k]) for k in ("g", "d1", "d2")})
    assert not np.allclose(np.asarray(d_only["d1"]), t_d1_grad, atol=1e-6)
