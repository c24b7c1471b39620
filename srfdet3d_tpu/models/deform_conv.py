"""Modulated deformable convolution (DCNv2) — pure-XLA bilinear taps.

TPU-native replacement for mmcv's CUDA `ModulatedDeformConv2dPack`, used by
the reference's waymo_LC ResNet-101 backbone
(`dcn=dict(type='DCNv2', deform_groups=1)`, stage_with_dcn=(F, F, T, T) —
/root/reference/configs/others/srfdet_dvoxel_waymo_LC.py:66-67).

Design: a regular zero-initialized conv predicts per-output-pixel tap
offsets and modulation scalars; each of the k*k kernel taps is then a
bilinear sample of the input at (base grid + tap offset + learned offset),
scaled by sigmoid(modulation), and the weighted taps contract with the
kernel as ONE (kk*Cin, Cout) matmul — gathers feed the MXU, mirroring the
gather-GEMM shape of every other hot op here.

Channel layout matches mmcv's CUDA kernel: the offset conv emits
3*deform_groups*kk channels, of which the first 2*kk are INTERLEAVED
(dy_0, dx_0, dy_1, dx_1, ...) per tap and the last kk are the modulation
logits (mask = sigmoid).  Zero init makes the initial op a plain conv
scaled by sigmoid(0) = 0.5, exactly like mmcv's init_offset.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def modulated_deform_conv(x: jnp.ndarray, weight: jnp.ndarray,
                          offset: jnp.ndarray, mask: jnp.ndarray,
                          kernel: int = 3, stride: int = 1,
                          padding: int = 1) -> jnp.ndarray:
    """x (B, H, W, Cin); weight (kk*Cin, Cout) tap-major (Cin minor);
    offset (B, Ho, Wo, kk, 2) as (dy, dx); mask (B, Ho, Wo, kk).
    Returns (B, Ho, Wo, Cout).  Out-of-image taps read zeros (the CUDA
    kernel's zero-padding bilinear)."""
    b, h, w, c = x.shape
    kk = kernel * kernel
    ho, wo = offset.shape[1], offset.shape[2]

    base_y = (jnp.arange(ho, dtype=x.dtype) * stride - padding)
    base_x = (jnp.arange(wo, dtype=x.dtype) * stride - padding)
    tap_dy = jnp.asarray(np.repeat(np.arange(kernel), kernel), x.dtype)
    tap_dx = jnp.asarray(np.tile(np.arange(kernel), kernel), x.dtype)
    py = (base_y[None, :, None, None] + tap_dy[None, None, None, :]
          + offset[..., 0])                                   # (B,Ho,Wo,kk)
    px = (base_x[None, None, :, None] + tap_dx[None, None, None, :]
          + offset[..., 1])

    flat = jnp.concatenate(
        [x.reshape(b * h * w, c), jnp.zeros((1, c), x.dtype)], axis=0)
    pad_row = b * h * w
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None, None]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.where(
            ok, boff + yy.astype(jnp.int32) * w + xx.astype(jnp.int32),
            pad_row)
        return flat[idx]                                      # (B,Ho,Wo,kk,C)

    s = (tap(y0, x0) * ((1 - ly) * (1 - lx))[..., None] +
         tap(y0, x0 + 1) * ((1 - ly) * lx)[..., None] +
         tap(y0 + 1, x0) * (ly * (1 - lx))[..., None] +
         tap(y0 + 1, x0 + 1) * (ly * lx)[..., None])
    s = s * mask[..., None]
    out = jnp.dot(s.reshape(b, ho, wo, kk * c), weight,
                  preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer: zero-init offset/modulation conv + deformable taps.

    Mirrors mmcv ModulatedDeformConv2dPack (deform_groups=1): the offset
    conv runs at the SAME stride as the deformable conv, its weights and
    bias start at zero, and the main kernel carries no bias (a norm layer
    always follows in ResNet bottlenecks)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kk = self.kernel * self.kernel
        cin = x.shape[-1]
        off = nn.Conv(3 * kk, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      padding=[(self.padding, self.padding)] * 2,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="conv_offset")(x)
        off = off.astype(jnp.float32)
        offset = off[..., :2 * kk].reshape(off.shape[:-1] + (kk, 2))
        mask = jax.nn.sigmoid(off[..., 2 * kk:])
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (kk * cin, self.features), jnp.float32)
        out = modulated_deform_conv(
            x, weight.astype(self.dtype), offset, mask,
            kernel=self.kernel, stride=self.stride, padding=self.padding)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,), jnp.float32)
        return out
