"""FPN neck matching mmdet's FPN semantics used by both reference necks.

Configs exercised (srfdet_voxel_nusc_LC.py:55-66, 97-106):
  - lateral 1x1 convs + top-down nearest upsample + 3x3 output convs,
  - num_outs > num_ins extra levels via stride-2 3x3 convs
    (`add_extra_convs='on_output'`), optional ReLU before extra convs,
  - `extra_convs=False`: mmdet's add_extra_convs=False default — extra
    levels are `max_pool2d(out[-1], 1, stride=2)`, i.e. a parameter-free
    stride-2 subsample.  The pillar and KITTI pts_necks use this mode
    (their configs never set add_extra_convs, e.g.
    srfdet_pillar_nusc_L.py:67-78, srfdet_voxel_kitti_L.py:78-90),
  - optional BN in every ConvModule (pts neck uses BN).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU


def _upsample_nearest(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    h, w = target_hw
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


class FPN(nn.Module):
    out_channels: int = 128
    num_outs: int = 4
    use_norm: bool = False
    use_act: bool = False
    relu_before_extra_convs: bool = False
    # True = add_extra_convs='on_output' (stride-2 convs); False = mmdet
    # default (parameter-free stride-2 max-pool of the last output)
    extra_convs: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        num_ins = len(inputs)
        laterals = [
            ConvBNReLU(self.out_channels, kernel=1, stride=1, padding=0,
                       bn=self.use_norm, relu=self.use_act, use_bias=not self.use_norm,
                       dtype=self.dtype, name=f"lateral_{i}")(x, train=train)
            for i, x in enumerate(inputs)
        ]
        for i in range(num_ins - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[-3:-1])
        outs = [
            ConvBNReLU(self.out_channels, kernel=3, stride=1, padding=1,
                       bn=self.use_norm, relu=self.use_act, use_bias=not self.use_norm,
                       dtype=self.dtype, name=f"fpn_{i}")(laterals[i],
                                                          train=train)
            for i in range(num_ins)
        ]
        # extra levels from the last output (add_extra_convs='on_output').
        # mmdet applies relu_before_extra_convs only from the SECOND extra
        # conv on — the first consumes outs[-1] raw (mmdet fpn.py forward)
        for i in range(self.num_outs - num_ins):
            if not self.extra_convs:
                # max_pool2d(kernel=1, stride=2) == top-left subsample
                outs.append(outs[-1][..., ::2, ::2, :])
                continue
            src = outs[-1]
            if self.relu_before_extra_convs and i > 0:
                src = nn.relu(src)
            outs.append(
                ConvBNReLU(self.out_channels, kernel=3, stride=2, padding=1,
                           bn=self.use_norm, relu=self.use_act,
                           use_bias=not self.use_norm, dtype=self.dtype,
                           name=f"extra_{i}")(src, train=train))
        return tuple(outs)
