"""Swin Transformer backbone (Swin-T layout) + BiSeNetV1_Swin context path.

Reference: lib/models/swin_transformer.py (timm-style Swin: window attention
with relative position bias :69-150, shifted windows, PatchMerging; embed 96,
depths (2,2,6,2), heads (3,6,12,24), window 7) and lib/models/bisenetv1_swin.py
(BiSeNetV1 whose ContextPath features come from Swin stages — feat8 (192ch),
feat16 (384ch), feat32 (768ch); ARMs at 384/768 :126-162).

TPU notes: window partition is pure reshape/transpose; attention matmuls are
(nW·B, 49, C) MXU work; everything static-shaped (inputs must be multiples of
window_size × stride).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mds_tpu.models.bisenetv1 import (
    AttentionRefinementModule,
    BiSeNetOutput,
    ConvBNReLU1,
    FeatureFusionModule,
    SpatialPath,
)
from mds_tpu.models.layers import upsample
from mds_tpu.registry import MODELS

Dtype = Any


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B,H,W,C) → (B·nW, ws, ws, C) (swin_transformer.py:37-48)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


class WindowAttention(nn.Module):
    """MSA in a window with relative position bias
    (swin_transformer.py:69-150)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        B_, N, C = x.shape
        ws, nh = self.window_size, self.num_heads
        head_dim = C // nh
        scale = head_dim**-0.5
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh), jnp.float32,
        )
        rpi = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias = rpb_table[rpi].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(-1, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (swin_transformer.py SwinBlock)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, ws, self.shift))
        else:
            mask = None
        xw = window_partition(x, ws).reshape(-1, ws * ws, c)
        xw = WindowAttention(self.dim, ws, self.num_heads, self.dtype,
                             name="attn")(xw, mask)
        x = window_reverse(xw.reshape(-1, ws, ws, c), ws, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact erf
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        b, h, w, c = x.shape
        # quadrant order matches the reference's cat([x0,x1,x2,x3]) =
        # [(even,even),(odd,even),(even,odd),(odd,odd)]
        # (swin_transformer.py:279-283) so torch weights import verbatim
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T trunk → (feat8, feat16, feat32) with dims (192, 384, 768)
    (the out_indices used by bisenetv1_swin.py:128-137)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        # patch embed 4×4
        x = nn.Conv(self.embed_dim, (4, 4), strides=4, dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="embed_norm")(x)
        feats = []
        dim = self.embed_dim
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window_size // 2
                x = SwinBlock(dim, heads, self.window_size, shift,
                              dtype=self.dtype, name=f"stage{si}_block{bi}")(x)
            if si > 0:
                # per-output LayerNorm on each emitted stage feature
                # (reference norm{i} over out_indices,
                # swin_transformer.py:586-588; stage 0's output is unused)
                feats.append(
                    nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"out_norm{si}")(x)
                )
            else:
                feats.append(x)
            if si < len(self.depths) - 1:
                x = PatchMerging(dim, self.dtype, name=f"merge{si}")(x)
                dim *= 2
        # stages at 1/4, 1/8, 1/16, 1/32 → return 1/8, 1/16, 1/32
        return feats[1], feats[2], feats[3]


@MODELS.register("bisenetv1_swin")
class BiSeNetV1Swin(nn.Module):
    """BiSeNetV1 with a Swin context path (lib/models/bisenetv1_swin.py)."""

    n_classes: Sequence[int] = (19,)
    aux: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        n = self.n_classes[0]
        self.swin = SwinTransformer(dtype=self.dtype)
        self.arm16 = AttentionRefinementModule(128, self.dtype)
        self.arm32 = AttentionRefinementModule(128, self.dtype)
        self.conv_head32 = ConvBNReLU1(128, 3, dtype=self.dtype)
        self.conv_head16 = ConvBNReLU1(128, 3, dtype=self.dtype)
        self.conv_avg = ConvBNReLU1(128, 1, padding=0, dtype=self.dtype)
        self.sp = SpatialPath(self.dtype)
        self.ffm = FeatureFusionModule(256, self.dtype)
        self.conv_out = BiSeNetOutput(256, n, up_factor=8, dtype=self.dtype)
        if self.aux:
            self.conv_out16 = BiSeNetOutput(64, n, up_factor=8, dtype=self.dtype)
            self.conv_out32 = BiSeNetOutput(64, n, up_factor=16, dtype=self.dtype)

    def _context(self, x, *, train: bool):
        feat8, feat16, feat32 = self.swin(x)
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = self.conv_avg(avg, train=train)
        f32 = self.arm32(feat32, train=train) + avg
        f32_up = upsample(f32, 2, "nearest")
        f32_up = self.conv_head32(f32_up, train=train)
        f16 = self.arm16(feat16, train=train) + f32_up
        f16_up = upsample(f16, 2, "nearest")
        f16_up = self.conv_head16(f16_up, train=train)
        return f16_up, f32_up

    def __call__(self, xs, *, train: bool = True):
        x = xs[0] if isinstance(xs, (list, tuple)) else xs
        x = x.astype(self.dtype)
        feat_cp8, feat_cp16 = self._context(x, train=train)
        feat_sp = self.sp(x, train=train)
        feat_fuse = self.ffm(feat_sp, feat_cp8, train=train)
        out = {"logits": [self.conv_out(feat_fuse, train=train)]}
        if self.aux and train:
            out["aux"] = [
                [self.conv_out16(feat_cp8, train=train)],
                [self.conv_out32(feat_cp16, train=train)],
            ]
        return out

    def eval_logits(self, x, dataset: int = 0):
        x = x.astype(self.dtype)
        feat_cp8, _ = self._context(x, train=False)
        feat_sp = self.sp(x, train=False)
        feat_fuse = self.ffm(feat_sp, feat_cp8, train=False)
        return self.conv_out(feat_fuse, train=False)

    def pred(self, x, dataset: int = 0):
        return jnp.argmax(self.eval_logits(x, dataset), axis=-1)
