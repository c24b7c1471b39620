"""Shared nn layers: masked batch norm, conv blocks.

The reference leans on torch BN1d/BN2d (eps=1e-3, momentum=0.01) everywhere.
Under GSPMD data-parallel training, batch statistics computed with plain
jnp reductions over a sharded batch axis are automatically global, which
reproduces the reference's NaiveSyncBatchNorm1dCustom (ops/norm.py:28)
without any explicit collective.

Point/pillar tensors here are capacity-padded, so BN must ignore padding:
`MaskedBatchNorm` computes masked statistics (a deliberate improvement over
the reference PFN, whose BN statistics include zero padding rows).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..parallel.mesh import sync_axis as _sync_axis


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with an optional validity mask.

    Input: (..., C); mask: (...,) bool or None. Statistics are computed in
    fp32 over every axis except the last, restricted to mask==True rows.
    """
    momentum: float = 0.01   # torch-style: new = (1-m)*old + m*batch
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            from ..parallel.mesh import psum_if_sync
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            # global-batch (SyncBN) stats: on the shard_map train path the
            # local sums are psum'd across the data axis (NaiveSyncBN
            # semantics, reference ops/norm.py:9-24); under plain jit the
            # psum is a no-op because the reductions already span the
            # global batch.  Two-pass (mean, then centred var) keeps the
            # non-sync numerics identical to the previous formula.
            if mask is not None:
                m = mask.astype(jnp.float32)[..., None]
                n = jnp.maximum(psum_if_sync(jnp.sum(m)), 1.0)
                mean = psum_if_sync(jnp.sum(xf * m, axis=red)) / n
                var = psum_if_sync(
                    jnp.sum(m * (xf - mean) ** 2, axis=red)) / n
            else:
                n = psum_if_sync(jnp.float32(np.prod(x.shape[:-1])))
                mean = psum_if_sync(jnp.sum(xf, axis=red)) / n
                var = psum_if_sync(
                    jnp.sum((xf - mean) ** 2, axis=red)) / n
            if not self.is_initializing():
                # torch stores the UNBIASED variance in running_var
                var_u = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * var_u
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


class ConvBNReLU(nn.Module):
    """3x3-style Conv2d + BN + optional ReLU on NHWC tensors."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = 1
    groups: int = 1
    use_bias: bool = False
    relu: bool = True
    bn: bool = True
    momentum: float = 0.01
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.groups, use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train,
                         axis_name=_sync_axis(),
                             momentum=1.0 - self.momentum,
                             epsilon=self.epsilon, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x
