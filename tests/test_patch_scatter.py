"""roi_window_scatter_add kernel (interpret mode) vs a numpy reference,
and the routed custom VJP of the RoIAlign patch path through the kernel."""

import numpy as np
import jax
import jax.numpy as jnp

from srfdet3d_tpu.ops.pallas_patch_scatter import roi_window_scatter_add


def _ref(dpv, lvl, ay, ax, shapes, p):
    """Flat-table scatter reference with the XLA path's spill semantics:
    rows wrap through the flat level-major layout (spill values are zero
    in real cotangents; the fuzz uses zeroed spill positions so both
    layouts agree)."""
    c = dpv.shape[-1]
    offs = np.cumsum([0] + [h * w for h, w in shapes])
    out = np.zeros((offs[-1], c), np.float64)
    for i in range(len(lvl)):
        h, w = shapes[lvl[i]]
        for dy in range(p):
            y = ay[i] + dy
            for dx in range(p):
                x = ax[i] + dx
                if y < h and x < w:
                    out[offs[lvl[i]] + y * w + x] += dpv[i, dy, dx]
    return out.astype(np.float32)


def _mk(rng, shapes, p, n, c=128):
    lvl = rng.integers(0, len(shapes), n).astype(np.int32)
    ay = np.zeros(n, np.int32)
    ax = np.zeros(n, np.int32)
    dpv = rng.normal(size=(n, p, p, c)).astype(np.float32)
    for i in range(n):
        h, w = shapes[lvl[i]]
        ay[i] = rng.integers(0, max(h - p, 0) + 1)
        ax[i] = rng.integers(0, max(w - p, 0) + 1)
        # zero the spill positions (zero bilinear weight in real
        # cotangents) so flat-wrap and 2D-pad semantics coincide
        if h < p:
            dpv[i, h - ay[i]:] = 0.0
        if w < p:
            dpv[i, :, w - ax[i]:] = 0.0
    return lvl, ay, ax, dpv


def test_roi_window_scatter_multilevel_overlaps():
    rng = np.random.default_rng(0)
    shapes = ((46, 46), (23, 23), (12, 12))
    p, n = 16, 200
    lvl, ay, ax, dpv = _mk(rng, shapes, p, n)
    # heavy duplication: many RoIs share one window (sequential RMW)
    lvl[:40], ay[:40], ax[:40] = lvl[0], ay[0], ax[0]
    dup = dpv[:40].copy()
    for i in range(40):
        dpv[i] = dup[i]
    out = np.asarray(roi_window_scatter_add(
        jnp.asarray(dpv), jnp.asarray(lvl), jnp.asarray(ay),
        jnp.asarray(ax), shapes, p, interpret=True))
    np.testing.assert_allclose(out, _ref(dpv, lvl, ay, ax, shapes, p),
                               atol=1e-4)


def test_roi_window_scatter_small_level_spill():
    """Levels smaller than the patch: anchors clamp to 0 and the spill
    cells (zero cotangent) land in the 2D pad — trimmed exactly."""
    rng = np.random.default_rng(1)
    shapes = ((40, 40), (9, 9))
    p = 16
    lvl, ay, ax, dpv = _mk(rng, shapes, p, 50)
    out = np.asarray(roi_window_scatter_add(
        jnp.asarray(dpv), jnp.asarray(lvl), jnp.asarray(ay),
        jnp.asarray(ax), shapes, p, interpret=True))
    np.testing.assert_allclose(out, _ref(dpv, lvl, ay, ax, shapes, p),
                               atol=1e-4)


def test_roi_patch_vjp_through_kernel(monkeypatch):
    """The routed _patch_gather backward (SCATTER_INTERPRET) equals the
    XLA flat-scatter backward on the real patch-path geometry."""
    from srfdet3d_tpu.ops import roi_align as ra
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.normal(size=(46, 46, 128)), jnp.float32),
             jnp.asarray(rng.normal(size=(23, 23, 128)), jnp.float32)]
    rois = np.zeros((24, 4), np.float32)
    ctr = rng.uniform(40, 300, (24, 2))
    sz = rng.uniform(16, 120, (24, 2))
    rois[:, :2] = ctr - sz / 2
    rois[:, 2:] = ctr + sz / 2
    rois = jnp.asarray(rois)

    def f(fs):
        out = ra.multilevel_roi_align(fs, rois, (8, 16), out_size=7,
                                      patch=32, patch_fallback=8)
        return jnp.sum(out * out)

    g_ref = jax.grad(f)(feats)
    monkeypatch.setattr(ra, "SCATTER_INTERPRET", True)
    g_ker = jax.grad(f)(feats)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)
