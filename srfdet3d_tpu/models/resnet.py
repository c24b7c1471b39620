"""ResNet image backbone (NHWC flax) for the *_r50_LC configs.

The reference consumes mmdet's ResNet [dep] (cfg srfdet_pillar_r50_LC.py);
this is the standard bottleneck ResNet with out_indices (0, 1, 2, 3) ->
strides 4/8/16/32 and channels (256, 512, 1024, 2048) for depth 50.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

RESNET_DEPTHS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = _ConvBN(self.planes, 1, dtype=self.dtype)(x, train)
        out = _ConvBN(self.planes, 3, self.stride, dtype=self.dtype)(
            out, train)
        out = _ConvBN(self.planes * 4, 1, relu=False, dtype=self.dtype)(
            out, train)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            identity = _ConvBN(self.planes * 4, 1, self.stride, relu=False,
                               dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + identity)


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = _ConvBN(self.planes, 3, self.stride, dtype=self.dtype)(x, train)
        out = _ConvBN(self.planes, 3, relu=False, dtype=self.dtype)(
            out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = _ConvBN(self.planes, 1, self.stride, relu=False,
                               dtype=self.dtype, name="down")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        kind, layers = RESNET_DEPTHS[self.depth]
        block = _Bottleneck if kind == "bottleneck" else _BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = 64
        for stage, n in enumerate(layers):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = block(planes, stride if i == 0 else 1, dtype=self.dtype,
                          name=f"layer{stage + 1}_{i}")(x, train=train)
            outs.append(x)
            planes *= 2
        return tuple(outs)
