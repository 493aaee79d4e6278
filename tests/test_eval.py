import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mds_tpu.evaluation.evaluator import (
    MscEvalCrop,
    MscEvalV0,
    compute_ious,
    confusion_hist,
    get_round_size,
    resize_bilinear_ac,
)


def test_get_round_size():
    assert get_round_size((500, 1000)) == (512, 1024)
    assert get_round_size((512, 1024)) == (512, 1024)
    assert get_round_size((1, 33)) == (32, 64)


def test_resize_ac_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 13, 17, 4)).astype(np.float32)
    for size in [(26, 34), (7, 9), (13, 17), (32, 32)]:
        got = np.asarray(resize_bilinear_ac(jnp.asarray(x), size))
        want = (
            F.interpolate(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                size=size, mode="bilinear", align_corners=True,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, atol=1e-4), size


def test_resize_ac_mm_matches_gather_and_torch():
    """resize_bilinear_ac_mm (MXU two-tap-matrix form, the flagship loss's
    hot path) ≡ resize_bilinear_ac to f32 rounding — values AND gradients —
    and matches torch ac=True interpolate."""
    from mds_tpu.models.layers import resize_bilinear_ac_mm

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 13, 17, 4)).astype(np.float32)
    xj = jnp.asarray(x)
    for size in [(52, 68), (26, 34), (7, 9), (13, 17), (1, 9)]:
        got = np.asarray(resize_bilinear_ac_mm(xj, size))
        base = np.asarray(resize_bilinear_ac(xj, size))
        np.testing.assert_allclose(got, base, atol=2e-6)
        want = (
            F.interpolate(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                size=size, mode="bilinear", align_corners=True,
            ).numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, atol=1e-4)
    # gradient parity through a nonlinear reduction (CE-like)
    f = lambda fn: lambda v: jnp.sum(
        jax.nn.logsumexp(fn(v, (26, 34)), axis=-1)
    )
    ga = jax.grad(f(resize_bilinear_ac))(xj)
    gb = jax.grad(f(resize_bilinear_ac_mm))(xj)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=2e-5)


def test_confusion_hist_matches_bincount():
    rng = np.random.default_rng(1)
    n = 5
    lb = rng.integers(0, n, (2, 8, 8)).astype(np.int64)
    lb[rng.random(lb.shape) < 0.2] = 255
    pred = rng.integers(0, n, (2, 8, 8)).astype(np.int64)
    got = np.asarray(confusion_hist(jnp.asarray(lb), jnp.asarray(pred), n))
    keep = lb != 255
    want = np.bincount(lb[keep] * n + pred[keep], minlength=n * n).reshape(n, n)
    np.testing.assert_array_equal(got, want)


def test_compute_ious():
    hist = np.array([[10, 0], [0, 30]])
    ious, miou = compute_ious(hist)
    np.testing.assert_allclose(ious, [1.0, 1.0])
    assert miou == 1.0
    # class never predicted nor labeled → nan, excluded from the mean
    hist = np.array([[10, 0, 0], [5, 5, 0], [0, 0, 0]])
    ious, miou = compute_ious(hist)
    assert np.isnan(ious[2])
    np.testing.assert_allclose(miou, np.nanmean(ious))


class _OracleLoader:
    """Images whose channel-0 encodes the label (class*20), for oracle tests."""

    def __init__(self, n_classes=4, n_batches=2, hw=(64, 96), flaw=False):
        self.n = n_classes
        self.batches = []
        rng = np.random.default_rng(0)
        for _ in range(n_batches):
            lb8 = rng.integers(0, n_classes, (1, hw[0] // 8, hw[1] // 8))
            lb = np.repeat(np.repeat(lb8, 8, 1), 8, 2).astype(np.uint8)
            if flaw:
                lb[:, :8, :8] = 255  # some ignore
            im = (lb.astype(np.float32) * 20.0)[..., None].repeat(3, axis=-1)
            self.batches.append({"im": im.astype(np.uint8), "lb": lb})

    def __iter__(self):
        return iter(self.batches)


def _oracle_logits_fn(n_classes):
    def fn(im, dataset):
        cls = jnp.clip(jnp.round(im[..., 0] / 20.0), 0, n_classes - 1).astype(jnp.int32)
        return jax.nn.one_hot(cls, n_classes) * 10.0

    return fn


def test_msceval_oracle_perfect():
    n = 4
    ev = MscEvalV0(scales=(1.0,), flip=False)
    miou = ev(_oracle_logits_fn(n), _OracleLoader(n), n, 0)
    assert miou == 1.0


def test_msceval_multiscale_flip_oracle():
    n = 4
    ev = MscEvalV0(scales=(0.5, 1.0, 1.5), flip=True)
    miou = ev(_oracle_logits_fn(n), _OracleLoader(n), n, 0)
    assert miou > 0.95  # scale-resampling can blur 8px block borders


def test_msceval_with_ignore():
    n = 4
    ev = MscEvalV0(scales=(1.0,), flip=False)
    miou = ev(_oracle_logits_fn(n), _OracleLoader(n, flaw=True), n, 0)
    assert miou == 1.0  # ignore pixels excluded from the hist


def test_msceval_crop_oracle():
    n = 4
    ev = MscEvalCrop(cropsize=(32, 32), cropstride=2.0 / 3, flip=True, scales=(1.0,))
    miou = ev(_oracle_logits_fn(n), _OracleLoader(n), n, 0)
    assert miou == 1.0


def test_make_evaluator_reads_nested_eval_block():
    """configs carry eval_scales/eval_crop under `eval`; ssc/mscf must use
    them (not fall back to train.cropsize)."""
    from mds_tpu.config import Configer
    from mds_tpu.evaluation.evaluator import _make_evaluator

    cfg = Configer(configs={
        "train": {"cropsize": [64, 64]},
        "eval": {"eval_scales": [0.5, 1.0], "eval_crop": [96, 128]},
    })
    ev = _make_evaluator(cfg, "mscf")
    assert ev.cropsize == (96, 128)
    assert ev.scales == (0.5, 1.0)
    ev = _make_evaluator(cfg, "msf")
    assert ev.scales == (0.5, 1.0)
