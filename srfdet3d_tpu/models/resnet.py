"""ResNet image backbone (NHWC flax) for the *_r50_LC / waymo_LC configs.

The reference consumes mmdet's ResNet [dep]:
  - r50 configs: depth 50, style='pytorch' (stride on the 3x3 conv)
    (srfdet_voxel_r50_nusc_LC.py:43-50);
  - waymo_LC: depth 101, style='caffe' (stride on the FIRST 1x1 conv) with
    DCNv2 modulated deformable 3x3 convs in stages 3-4
    (srfdet_dvoxel_waymo_LC.py:60-67, stage_with_dcn=(F, F, T, T)).
Both emit out_indices (0, 1, 2, 3) -> strides 4/8/16/32, channels
(256, 512, 1024, 2048).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import sync_axis as _sync_axis

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
        x = nn.BatchNorm(use_running_average=not train,
                         axis_name=_sync_axis(), momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    # 'pytorch': stride on the 3x3; 'caffe': stride on the first 1x1
    # (mmdet ResNet style semantics)
    style: str = "pytorch"
    dcn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        from .deform_conv import ModulatedDeformConv
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        identity = x
        out = _ConvBN(self.planes, 1, s1, dtype=self.dtype)(x, train)
        if self.dcn:
            out = ModulatedDeformConv(self.planes, 3, s2, dtype=self.dtype,
                                      name="dcn2")(out)
            out = nn.BatchNorm(use_running_average=not train,
                         axis_name=_sync_axis(), momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype)(out)
            out = nn.relu(out)
        else:
            out = _ConvBN(self.planes, 3, s2, dtype=self.dtype)(out, train)
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
    style: str = "pytorch"
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        kind, layers = RESNET_DEPTHS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         axis_name=_sync_axis(), momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = 64
        for stage, n in enumerate(layers):
            stride = 1 if stage == 0 else 2
            dcn = self.stage_with_dcn[stage]
            for i in range(n):
                if kind == "bottleneck":
                    x = _Bottleneck(planes, stride if i == 0 else 1,
                                    style=self.style, dcn=dcn,
                                    dtype=self.dtype,
                                    name=f"layer{stage + 1}_{i}")(
                        x, train=train)
                else:
                    x = _BasicBlock(planes, stride if i == 0 else 1,
                                    dtype=self.dtype,
                                    name=f"layer{stage + 1}_{i}")(
                        x, train=train)
            outs.append(x)
            planes *= 2
        return tuple(outs)
