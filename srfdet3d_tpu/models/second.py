"""SECOND dense BEV backbone (reference second_custom.py:11-91).

NHWC, bf16-friendly: stages of [stride conv + N x conv]-BN-ReLU; returns the
per-stage feature tuple.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNReLU


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i, n_layers in enumerate(self.layer_nums):
            x = ConvBNReLU(self.out_channels[i], kernel=3,
                           stride=self.layer_strides[i], padding=1,
                           dtype=self.dtype)(x, train=train)
            for _ in range(n_layers):
                x = ConvBNReLU(self.out_channels[i], kernel=3, stride=1,
                               padding=1, dtype=self.dtype)(x, train=train)
            outs.append(x)
        return tuple(outs)
