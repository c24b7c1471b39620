"""Windowed equality-match rulebook kernel (ops/pallas_eqmatch.py) vs the
gather-chain bitmap rulebooks — bit-identical on randomized scenes
(interpret mode; the on-device run is covered by tests_tpu)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srfdet3d_tpu.ops import bitmap_rulebook as br


def _scene(rng, b, v, shape, density=0.5):
    d, h, w = shape
    n = int(v * density)
    coords = np.zeros((b, v, 3), np.int32)
    mask = np.zeros((b, v), bool)
    for s in range(b):
        cells = rng.choice(d * h * w, size=n, replace=False)
        z, yx = cells % d, cells // d
        y, x = yx // w, yx % w
        key = (y * w + x) * d + z
        o = np.argsort(key)
        coords[s, :n] = np.stack([z[o], y[o], x[o]], -1)
        mask[s, :n] = True
    return jnp.asarray(coords), jnp.asarray(mask)


@pytest.mark.parametrize("b,v,shape,wc,tm", [
    (1, 512, (12, 24, 24), 256, 128),
    (2, 384, (8, 16, 40), 256, 128),
])
def test_subm_eqmatch_matches_bitmap(b, v, shape, wc, tm):
    rng = np.random.default_rng(0)
    coords, mask = _scene(rng, b, v, shape)
    cs, vcol, vz = br.build_columns(coords, mask, shape)
    ref = np.asarray(br.subm_rulebook_bitmap(cs, vcol, vz, mask))
    got = np.asarray(br.subm_rulebook_eqmatch(
        cs, coords, vcol, vz, mask, wc=wc, tm=tm, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_subm_eqmatch_tiny_window_falls_back_exact():
    """A window too small to cover the neighbor band must flag OOW and
    produce the fallback's exact result (lax.cond path)."""
    rng = np.random.default_rng(1)
    shape = (8, 24, 24)
    coords, mask = _scene(rng, 1, 512, shape, density=0.8)
    cs, vcol, vz = br.build_columns(coords, mask, shape)
    ref = np.asarray(br.subm_rulebook_bitmap(cs, vcol, vz, mask))
    got = np.asarray(br.subm_rulebook_eqmatch(
        cs, coords, vcol, vz, mask, wc=128, tm=128, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("pad,cap", [((1, 1, 1), 256), ((0, 1, 1), 192)])
def test_strided_eqmatch_matches_bitmap(pad, cap):
    rng = np.random.default_rng(2)
    shape = (12, 20, 28)
    coords, mask = _scene(rng, 2, 400, shape, density=0.6)
    cs, _, _ = br.build_columns(coords, mask, shape)
    ref = br.strided_downsample_bitmap(cs, pad, cap, eqmatch=False)
    got = br.strided_downsample_bitmap(cs, pad, cap, eqmatch=True,
                                       interpret=True)
    for r, g in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_capacity_overflow_guard():
    """Neighbors whose rows were dropped by a stage capacity must miss in
    the eqmatch path exactly as in the gather path."""
    rng = np.random.default_rng(3)
    shape = (6, 16, 16)
    coords, mask = _scene(rng, 1, 300, shape, density=0.9)
    cs, _, _ = br.build_columns(coords, mask, shape)
    # tiny out_cap forces site drops -> some rulebook rows beyond cap
    ref = br.strided_downsample_bitmap(cs, (1, 1, 1), 64, eqmatch=False)
    got = br.strided_downsample_bitmap(cs, (1, 1, 1), 64, eqmatch=True,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(ref[4]))
