"""VoVNetV2 (eSE) image backbone — NHWC flax.

TPU-native reimplementation of the reference's VoVNet (vovnet.py:269-374, a
torch port of the public VoVNetV2/CenterMask code): stem of three 3x3 convs,
four OSA stages with one-shot-aggregation blocks, effective-SE channel
attention, and identity residuals inside a stage.  `frozen_stages` /
`norm_eval` (vovnet.py:353-366) are realized functionally: the optimizer
masks frozen parameters (optax.masked) and BN uses running stats when frozen,
instead of mutating requires_grad.

Stage spec data (the public architecture constants, vovnet.py:11-89).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import sync_axis as _sync_axis

# public VoVNetV2 architecture constants
VOVNET_SPECS = {
    "vovnet-19-slim": dict(stem=(64, 64, 128), conv_ch=(64, 80, 96, 112),
                           out_ch=(112, 256, 384, 512), layer_per_block=3,
                           block_per_stage=(1, 1, 1, 1)),
    "vovnet-19": dict(stem=(64, 64, 128), conv_ch=(128, 160, 192, 224),
                      out_ch=(256, 512, 768, 1024), layer_per_block=3,
                      block_per_stage=(1, 1, 1, 1)),
    "vovnet-39": dict(stem=(64, 64, 128), conv_ch=(128, 160, 192, 224),
                      out_ch=(256, 512, 768, 1024), layer_per_block=5,
                      block_per_stage=(1, 1, 2, 2)),
    "vovnet-57": dict(stem=(64, 64, 128), conv_ch=(128, 160, 192, 224),
                      out_ch=(256, 512, 768, 1024), layer_per_block=5,
                      block_per_stage=(1, 1, 4, 3)),
    "vovnet-99": dict(stem=(64, 64, 128), conv_ch=(128, 160, 192, 224),
                      out_ch=(256, 512, 768, 1024), layer_per_block=5,
                      block_per_stage=(1, 3, 9, 3)),
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


class _eSE(nn.Module):
    """Effective squeeze-excitation: global pool -> 1x1 conv -> hsigmoid."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)        # (..., 1, 1, C)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(s)
        s = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0                # hard sigmoid
        return x * s


class _OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    layer_per_block: int
    identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        feats = [x]
        for i in range(self.layer_per_block):
            x = _ConvBN(self.conv_ch, dtype=self.dtype,
                        name=f"conv{i}")(x, train=train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = _ConvBN(self.out_ch, kernel=1, dtype=self.dtype,
                    name="concat")(x, train=train)
        x = _eSE(self.out_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + inp
        return x


class VoVNet(nn.Module):
    """Returns stage2..stage5 features (strides 4, 8, 16, 32)."""
    spec_name: str = "vovnet-99"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        spec = VOVNET_SPECS[self.spec_name]
        s1, s2, s3 = spec["stem"]
        x = _ConvBN(s1, stride=2, dtype=self.dtype, name="stem1")(x, train)
        x = _ConvBN(s2, stride=1, dtype=self.dtype, name="stem2")(x, train)
        x = _ConvBN(s3, stride=2, dtype=self.dtype, name="stem3")(x, train)

        outs = []
        for stage in range(4):
            if stage > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(0, 1), (0, 1)])
            for block in range(spec["block_per_stage"][stage]):
                x = _OSABlock(
                    conv_ch=spec["conv_ch"][stage],
                    out_ch=spec["out_ch"][stage],
                    layer_per_block=spec["layer_per_block"],
                    identity=(block > 0),
                    dtype=self.dtype,
                    name=f"stage{stage + 2}_block{block}")(x, train=train)
            outs.append(x)
        return tuple(outs)
