import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.parallel.mesh import make_mesh
from mds_tpu.parallel.spatial import plan_tiles, tiled_inference


def test_plan_tiles_covers_everything():
    extent, plans = plan_tiles(2048, 8, margin=96, multiple=32)
    assert extent % 32 == 0
    covered = np.zeros(2048, bool)
    for src, c0, clen in plans:
        assert 0 <= src and src + extent <= 2048 or extent >= 2048
        covered[c0 : c0 + clen] = True
    assert covered.all()


def test_tiled_inference_matches_whole_image_oracle():
    """With a local (receptive-field-1) logits_fn, tiling must be exact."""
    mesh = make_mesh(8)
    n = 4
    rng = np.random.default_rng(0)
    lb = rng.integers(0, n, (1, 64, 256)).astype(np.int32)
    im = (lb * 20).astype(np.float32)[..., None].repeat(3, -1)

    def logits_fn(x, ds):
        cls = jnp.clip(jnp.round(x[..., 0] / 20.0), 0, n - 1).astype(jnp.int32)
        return jax.nn.one_hot(cls, n)

    logits = tiled_inference(
        logits_fn, jnp.asarray(im), n, mesh=mesh, margin=32
    )
    assert logits.shape == (1, 64, 256, n)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)), lb)


def test_tiled_inference_downsampling_fn():
    """logits_fn that halves resolution (stride-2 model)."""
    mesh = make_mesh(4)
    n = 3

    def logits_fn(x, ds):
        small = x[:, ::2, ::2, 0]
        cls = jnp.clip(jnp.round(small / 20.0), 0, n - 1).astype(jnp.int32)
        return jax.nn.one_hot(cls, n)

    rng = np.random.default_rng(1)
    lb2 = rng.integers(0, n, (1, 16, 64)).astype(np.int32)
    lb = np.repeat(np.repeat(lb2, 2, 1), 2, 2)
    im = (lb * 20).astype(np.float32)[..., None].repeat(3, -1)
    logits = tiled_inference(logits_fn, jnp.asarray(im), n, mesh=mesh, margin=16)
    assert logits.shape == (1, 16, 64, n)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)), lb2)


def test_halo_conv3x3_exact_vs_unsharded():
    """shard_map + ppermute halo exchange: bit-equal to the whole-image conv
    (the margin-free spatial-sharding primitive)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mds_tpu.parallel.mesh import make_mesh
    from mds_tpu.parallel.spatial import halo_conv3x3

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 64, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 4)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = halo_conv3x3(x, k, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
