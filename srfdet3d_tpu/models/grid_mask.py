"""GridMask image augmentation (reference models/utils/grid_mask.py:7-128).

Functional jax version of the reference's numpy/PIL implementation (which
builds the mask on host and ships it to GPU via `.cuda()`, grid_mask.py:118).
Here the mask is computed on device from modular arithmetic over coordinate
grids — no host round-trip, fully batched.

Reference parameters (srfdet.py:47): use_h=use_w=True, rotate=1 (randint(1)
is always 0, so rotation is a no-op in the reference too), offset=False,
ratio=0.5, mode=1, prob=0.7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array,
              images: jnp.ndarray,
              prob: float = 0.7,
              ratio: float = 0.5) -> jnp.ndarray:
    """Apply GridMask to (..., H, W, C) images (one mask per leading index).

    mode=1 semantics: pixels INSIDE the stripes (width l, period d, random
    phase) are kept, the rest zeroed; applied with probability `prob` per
    image.
    """
    h, w = images.shape[-3], images.shape[-2]
    lead = images.shape[:-3]
    n = 1
    for s in lead:
        n *= s
    flat = images.reshape((n, h, w) + images.shape[-1:])

    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)
    apply_m = jax.random.uniform(k_apply, (n,)) < prob
    d = jax.random.randint(k_d, (n,), 2, max(h, 3))          # (n,)
    l = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k_sh, (n,), 0, 1 << 30) % d
    st_w = jax.random.randint(k_sw, (n,), 0, 1 << 30) % d

    ys = jnp.arange(h)[None, :]                              # (1, H)
    xs = jnp.arange(w)[None, :]
    in_h = ((ys - st_h[:, None]) % d[:, None]) < l[:, None]  # (n, H)
    in_w = ((xs - st_w[:, None]) % d[:, None]) < l[:, None]  # (n, W)
    keep = in_h[:, :, None] | in_w[:, None, :]               # (n, H, W)
    keep = keep | ~apply_m[:, None, None]
    out = flat * keep[..., None].astype(flat.dtype)
    return out.reshape(images.shape)
