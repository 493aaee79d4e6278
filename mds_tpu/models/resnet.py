"""ResNet18 feature backbone for BiSeNetV1 (single-BN).

Reference: lib/models/resnet.py:20-107 — torchvision-layout ResNet18 trunk
returning (feat8, feat16, feat32). Pretrained-weight loading is handled by
mds_tpu.deploy.torch_import (key remap from the torchvision checkpoint).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import conv_init, max_pool_3x3_s2

Dtype = Any


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + shortcut (lib/models/resnet.py:20-49)."""

    out_chan: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                  kernel_init=conv_init())
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        r = nn.Conv(self.out_chan, (3, 3), strides=self.stride,
                    padding=[(1, 1)] * 2, name="conv1", **kw)(x)
        r = nn.relu(bn("bn1")(r))
        r = nn.Conv(self.out_chan, (3, 3), padding=[(1, 1)] * 2, name="conv2", **kw)(r)
        r = bn("bn2")(r)
        s = x
        if x.shape[-1] != self.out_chan or self.stride != 1:
            s = nn.Conv(self.out_chan, (1, 1), strides=self.stride,
                        name="downsample_conv", **kw)(x)
            s = bn("downsample_bn")(s)
        return nn.relu(s + r)


class Resnet18(nn.Module):
    """(feat8, feat16, feat32) trunk (lib/models/resnet.py:60-91)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        from mds_tpu.models.layers import _STEM_IMPL, BNFold, _ConvKernelHolder

        fuse = (
            not train and _STEM_IMPL == "pallas"
            and self.dtype == jnp.bfloat16 and x.shape[-1] == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            # Mosaic rejects the kernel's stage dots below 256 output lanes
            # ("unsupported shape cast", probed r5: W=384 fails, W≥512 ok)
            and x.shape[2] >= 512
        )
        if fuse:
            # deploy path: the 7×7/s2 RGB stem is XLA's worst op in the V1
            # graph (C=3 lane starvation: ~2.7 ms conv + ~2.4 ms layout
            # copies of an 11.45 ms 1024×2048 graph, profiled v5e
            # 2026-08-18) — run it as the Pallas patch-matmul kernel with
            # bn1 folded in (ops/pallas/stem.py stem7_conv_bn_relu_s2)
            from mds_tpu.ops.pallas.stem import stem7_conv_bn_relu_s2

            k = _ConvKernelHolder((7, 7, 3, 64), name="conv1")()
            s, b = BNFold(64, name="bn1")()
            x = stem7_conv_bn_relu_s2(
                x.astype(jnp.bfloat16), k, s, b,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=conv_init(),
                        name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn1")(x)
            x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for i in range(2):
            x = BasicBlock(64, 1, self.dtype, name=f"layer1_{i}")(x, train=train)
        feat8 = x
        for i in range(2):
            feat8 = BasicBlock(128, 2 if i == 0 else 1, self.dtype,
                               name=f"layer2_{i}")(feat8, train=train)
        feat16 = feat8
        for i in range(2):
            feat16 = BasicBlock(256, 2 if i == 0 else 1, self.dtype,
                                name=f"layer3_{i}")(feat16, train=train)
        feat32 = feat16
        for i in range(2):
            feat32 = BasicBlock(512, 2 if i == 0 else 1, self.dtype,
                                name=f"layer4_{i}")(feat32, train=train)
        return feat8, feat16, feat32
