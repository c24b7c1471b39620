"""Data pipeline tests: transforms, synthetic dataset, CBGS, loader."""
import numpy as np
import pytest

from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.data import (CBGSWrapper, SyntheticDataset, collate_batch,
                               data_loader, global_rot_scale_trans,
                               limit_period, object_range_filter, pad_gts,
                               pad_points, points_range_filter,
                               random_flip_3d)
from srfdet3d_tpu.data.box_np import points_in_boxes_bev


def test_rot_scale_trans_consistency():
    """Points inside a box stay inside after rot/scale/trans."""
    rng = np.random.default_rng(0)
    box = np.array([[2.0, 1.0, 0.0, 2.0, 4.0, 1.5, 0.6, 0.0, 0.0]],
                   np.float32)
    # points near box center
    pts = np.zeros((50, 5), np.float32)
    pts[:, :2] = box[0, :2] + rng.uniform(-0.4, 0.4, (50, 2))
    pts[:, 2] = rng.uniform(0.1, 1.0, 50)
    assert points_in_boxes_bev(pts[:, :3], box).all()
    p2, b2 = global_rot_scale_trans(pts, box, rng)
    assert points_in_boxes_bev(p2[:, :3], b2).all()


def test_flip_consistency():
    rng = np.random.default_rng(1)
    box = np.array([[2.0, 1.0, 0.0, 2.0, 4.0, 1.5, 0.6, 1.0, -2.0]],
                   np.float32)
    pts = np.zeros((50, 5), np.float32)
    pts[:, :2] = box[0, :2] + rng.uniform(-0.4, 0.4, (50, 2))
    p2, b2, _ = random_flip_3d(pts, box, rng, 1.0, 1.0)  # both flips
    assert np.allclose(p2[:, 0], -pts[:, 0])
    assert np.allclose(p2[:, 1], -pts[:, 1])
    assert points_in_boxes_bev(p2[:, :3], b2).all()


def test_range_filters_and_limit_period():
    pts = np.array([[0, 0, 0, 0, 0], [100, 0, 0, 0, 0]], np.float32)
    out = points_range_filter(pts, (-10, -10, -5, 10, 10, 5))
    assert len(out) == 1
    boxes = np.array([[0, 0, 0, 1, 1, 1, 4.0], [99, 0, 0, 1, 1, 1, 0.0]],
                     np.float32)
    labels = np.array([0, 1])
    b2, l2 = object_range_filter(boxes, labels, (-10, -10, -5, 10, 10, 5))
    assert len(b2) == 1 and l2[0] == 0
    assert -np.pi <= b2[0, 6] < np.pi
    assert np.isclose(limit_period(np.array(4.0)), 4.0 - 2 * np.pi)


def test_pad_points_and_gts():
    pts = np.ones((10, 5), np.float32)
    out, mask = pad_points(pts, 16)
    assert out.shape == (16, 5) and mask.sum() == 10
    boxes = np.array([[1, 2, 0.0, 1, 1, 2.0, 0.5]], np.float32)
    gb, gl, gm = pad_gts(boxes, np.array([2]), 4, box_dim=9)
    assert gb.shape == (4, 9) and gm.sum() == 1
    assert np.isclose(gb[0, 2], 1.0)      # bottom -> gravity center (+h/2)


def test_synthetic_dataset_and_loader():
    cfg = tiny_test_config()
    ds = SyntheticDataset(cfg, length=6)
    s = ds[0]
    assert s["points"].shape == (cfg.points_cap, cfg.points_dim)
    assert s["gt_boxes"].shape == (cfg.gt_cap, 9)
    assert s["gt_mask"].any()

    batches = list(data_loader(ds, batch_size=2, num_workers=2, seed=0))
    assert len(batches) == 3
    assert batches[0]["points"].shape[0] == 2

    # single-threaded path agrees in shape
    b0 = next(iter(data_loader(ds, 2, shuffle=False, num_workers=0)))
    assert b0["points"].shape == batches[0]["points"].shape


def test_cbgs_wrapper_balances():
    cfg = tiny_test_config()
    ds = SyntheticDataset(cfg, length=10)
    wrapped = CBGSWrapper(ds)
    assert len(wrapped) > 0
    s = wrapped[0]
    assert s["points"].shape == (cfg.points_cap, cfg.points_dim)


def test_collate_batch():
    cfg = tiny_test_config()
    ds = SyntheticDataset(cfg, length=2)
    batch = collate_batch([ds[0], ds[1]])
    assert batch["points"].shape == (2, cfg.points_cap, cfg.points_dim)


def test_lc_configs_disable_geometric_augs():
    """The reference's LC fine-tune pipelines carry NO geometric lidar augs
    (srfdet_voxel_nusc_LC.py:226-251) — rotating/flipping the lidar frame
    without compensating lidar2img would project boxes onto the wrong
    image regions.  Every use_img config must ship aug-disabled."""
    from srfdet3d_tpu.configs import CONFIGS, get_config
    for name in CONFIGS:
        cfg = get_config(name)
        if cfg.use_img:
            assert not cfg.aug.rot_scale_trans, name
            # kitti_LC ships the reference's sync_2d flip — allowed
            # because it compensates lidar2img exactly; any OTHER
            # lidar-frame aug on an LC config is a projection bug
            if not cfg.aug.sync_flip_2d:
                assert cfg.aug.flip_horizontal == 0.0, name
            assert cfg.aug.flip_vertical == 0.0, name
        elif name.startswith("srfdet"):
            assert cfg.aug.rot_scale_trans, name


def test_multi_sweep_use_dim_subset(tmp_path):
    """use_dim=(0,1,2,4): the sweep's lag (raw column 4) must land in the
    sliced time column and intensity (raw 3) must be dropped."""
    import os
    from srfdet3d_tpu.data.transforms import multi_sweep_aggregate
    raw = np.zeros((8, 5), np.float32)
    raw[:, :3] = np.arange(24).reshape(8, 3) + 10.0   # away from origin
    raw[:, 3] = 7.0                                   # intensity marker
    path = os.path.join(tmp_path, "sweep.bin")
    raw.tofile(path)
    sweep = {"data_path": path,
             "sensor2lidar_rotation": np.eye(3),
             "sensor2lidar_translation": np.zeros(3),
             "timestamp": 1_000_000.0}                # 1 s
    key = np.zeros((4, 4), np.float32)                # already use_dim-cut
    key[:, :3] = 100.0
    out = multi_sweep_aggregate(
        key, [sweep], sweeps_num=1, use_dim=(0, 1, 2, 4),
        test_mode=True, load_dim=5, key_timestamp_us=3_000_000.0)
    assert out.shape == (12, 4)
    np.testing.assert_allclose(out[:4, 3], 0.0)       # key lag zeroed
    np.testing.assert_allclose(out[4:, 3], 2.0)       # 3s - 1s lag
    assert not np.any(out[4:, 3] == 7.0)              # intensity dropped


def test_object_sample_removal_is_3d_not_bev_column():
    """ObjectSample must remove only points INSIDE the pasted 3D box
    (mmdet3d points_in_rbbox), not the whole vertical BEV column."""
    from srfdet3d_tpu.data.box_np import points_in_boxes_3d
    box = np.array([[0.0, 0.0, -1.0, 2.0, 2.0, 1.5, 0.0]], np.float32)
    pts = np.array([
        [0.0, 0.0, -0.5],    # inside (z in [-1.0, 0.5])
        [0.0, 0.0, 4.0],     # same column, overpass height -> keep
        [0.0, 0.0, -3.0],    # same column, below -> keep
        [5.0, 5.0, -0.5],    # outside BEV
    ], np.float32)
    inside = points_in_boxes_3d(pts, box)[:, 0]
    np.testing.assert_array_equal(inside, [True, False, False, False])


def test_img_resize_preserves_normalized_floats():
    """_resize must not round-trip through uint8 (normalized images are
    mostly negative; clipping them to 0 destroyed the features)."""
    from srfdet3d_tpu.data.img_transforms import _resize
    img = np.full((8, 8, 3), -1.7, np.float32)
    out = _resize(img, (4, 4))
    np.testing.assert_allclose(out, -1.7, atol=1e-5)


def test_object_noise_moves_points_with_boxes():
    """ObjectNoise (reference kitti_L.py:247-251): each box gets its own
    yaw+translation noise; points inside move rigidly with it, points
    outside are untouched, and the point-in-box relationship survives."""
    from srfdet3d_tpu.data.box_np import points_in_boxes_3d
    from srfdet3d_tpu.data.transforms import object_noise
    rng = np.random.default_rng(0)
    boxes = np.array([
        [0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.3],
        [20.0, 20.0, 0.0, 2.0, 4.0, 1.5, -0.5],
    ], np.float32)
    # points well inside each box + far-away outsiders
    # box z is BOTTOM center (see test_object_sample_removal_is_3d...):
    # box 0 spans z in [0, 1.5]
    inside0 = np.array([[0.2, 0.5, 0.2, 9.0], [-0.3, -1.0, 0.7, 9.0]],
                       np.float32)
    inside1 = np.array([[20.1, 19.5, 0.1, 9.0]], np.float32)
    outside = np.array([[50.0, 50.0, 0.0, 9.0]], np.float32)
    pts = np.concatenate([inside0, inside1, outside], axis=0)
    new_pts, new_boxes = object_noise(pts, boxes, rng)
    # outsiders untouched
    np.testing.assert_array_equal(new_pts[3], outside[0])
    # some noise was actually applied (trans_std=1 makes this sure)
    assert not np.allclose(new_boxes, boxes)
    # extra feature dims survive
    np.testing.assert_array_equal(new_pts[:, 3], 9.0)
    # rigid motion: interior points stay inside their (moved) boxes
    m = points_in_boxes_3d(new_pts[:3, :3], new_boxes)
    np.testing.assert_array_equal(m[:, 0], [True, True, False])
    np.testing.assert_array_equal(m[:, 1], [False, False, True])
    # rigid motion preserves the box-frame offsets: distances between the
    # two points of box 0 are unchanged
    d_old = np.linalg.norm(inside0[0, :3] - inside0[1, :3])
    d_new = np.linalg.norm(new_pts[0, :3] - new_pts[1, :3])
    np.testing.assert_allclose(d_new, d_old, rtol=1e-5)


def test_object_noise_empty_and_none():
    from srfdet3d_tpu.data.transforms import object_noise
    rng = np.random.default_rng(0)
    pts = np.zeros((5, 4), np.float32)
    p2, b2 = object_noise(pts, np.zeros((0, 7), np.float32), rng)
    np.testing.assert_array_equal(p2, pts)
    p3, b3 = object_noise(pts, None, rng)
    assert b3 is None


def test_prep_image_pad_mode():
    """mode='pad' = mmcv Normalize + Pad: unscaled top-left placement,
    zero padding, identity projection scale (reference
    srfdet_voxel_nusc_LC.py:246-247)."""
    from srfdet3d_tpu.config import ImgBranchConfig
    from srfdet3d_tpu.data.datasets import (IMAGENET_MEAN, IMAGENET_STD,
                                            _prep_image)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (9, 16, 3)).astype(np.float32)
    icfg = ImgBranchConfig(img_shape=(12, 16), mode="pad", bgr=False)
    out, sx, sy, _ = _prep_image(img, icfg)
    assert out.shape == (12, 16, 3) and sx == 1.0 and sy == 1.0
    np.testing.assert_allclose(
        out[:9], (img - IMAGENET_MEAN) / IMAGENET_STD, rtol=1e-5)
    np.testing.assert_array_equal(out[9:], 0.0)


def test_prep_image_bgr_mirrors_reference_norm():
    """bgr=True must equal mmcv to_rgb=False semantics: normalize the
    BGR-ordered image with the BGR-ordered mean/std (the constants are
    exact mirrors of the RGB ones)."""
    from srfdet3d_tpu.config import ImgBranchConfig
    from srfdet3d_tpu.data.datasets import (IMAGENET_MEAN, IMAGENET_STD,
                                            _prep_image)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (8, 8, 3)).astype(np.float32)
    icfg = ImgBranchConfig(img_shape=(8, 8), mode="pad", bgr=True)
    out, _, _, _ = _prep_image(img, icfg)
    bgr_img = img[..., ::-1]
    expect = (bgr_img - IMAGENET_MEAN[::-1]) / IMAGENET_STD[::-1]
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_prep_image_resize_fallback():
    """Sources larger than the canvas fall back to resize with the
    projection rescale factors returned."""
    from srfdet3d_tpu.config import ImgBranchConfig
    from srfdet3d_tpu.data.datasets import _prep_image
    img = np.zeros((20, 40, 3), np.float32)
    icfg = ImgBranchConfig(img_shape=(10, 20), mode="pad", bgr=False)
    out, sx, sy, _ = _prep_image(img, icfg)
    assert out.shape == (10, 20, 3)
    assert sx == 0.5 and sy == 0.5


def test_bev_overlap_exact_matches_iou_oracle():
    """SAT overlap test agrees with the rotated-IoU oracle (overlap iff
    IoU > 0) on random pairs, and accepts the clearance the old circle
    test wrongly rejected (two parked cars 2 m apart)."""
    import jax.numpy as jnp
    from srfdet3d_tpu.data.box_np import bev_overlap_exact
    from srfdet3d_tpu.geometry.iou import iou_3d
    rng = np.random.default_rng(0)
    n = 200
    boxes = np.zeros((n, 2, 7), np.float32)
    boxes[..., 0:2] = rng.uniform(-4, 4, (n, 2, 2))
    boxes[..., 2] = 0.0
    boxes[..., 3:5] = rng.uniform(0.5, 5.0, (n, 2, 2))
    boxes[..., 5] = 2.0
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (n, 2))
    a = boxes[:, 0].copy()
    c = boxes[:, 1].copy()
    # gravity-center IoU oracle (boxes here are z-centered already)
    ious = np.array([float(iou_3d(jnp.asarray(a[i:i + 1]),
                                  jnp.asarray(c[i:i + 1]))[0, 0])
                     for i in range(n)])
    got = np.array([bool(bev_overlap_exact(a[i], c[i:i + 1])[0])
                    for i in range(n)])
    clear = np.abs(ious) > 1e-5          # skip knife-edge touching cases
    np.testing.assert_array_equal(got[clear], ious[clear] > 0)

    # two parked cars, 2 m apart laterally: NOT overlapping
    car1 = np.array([0.0, 0.0, 0.0, 1.9, 4.5, 1.5, 0.0], np.float32)
    car2 = np.array([2.0, 0.0, 0.0, 1.9, 4.5, 1.5, 0.0], np.float32)
    assert not bev_overlap_exact(car1, car2[None])[0]
    # and genuinely intersecting ones ARE
    car3 = np.array([1.0, 0.5, 0.0, 1.9, 4.5, 1.5, 0.4], np.float32)
    assert bev_overlap_exact(car1, car3[None])[0]


def test_object_noise_survives_clutter():
    """With an exact collision test, neighbors 2 m apart still receive
    noise (the circle test rejected every candidate here)."""
    from srfdet3d_tpu.data.transforms import object_noise
    rng = np.random.default_rng(0)
    boxes = np.array([
        [0.0, 0.0, 0.0, 1.9, 4.5, 1.5, 0.0],
        [2.2, 0.0, 0.0, 1.9, 4.5, 1.5, 0.0],
        [4.4, 0.0, 0.0, 1.9, 4.5, 1.5, 0.0],
    ], np.float32)
    pts = np.zeros((1, 4), np.float32)
    _, new_boxes = object_noise(pts, boxes, rng,
                                trans_std=(0.3, 0.3, 0.2))
    moved = ~np.all(np.isclose(new_boxes, boxes), axis=1)
    assert moved.any(), "no box received noise in a routine parking row"


def test_cbgs_epoch_propagation_and_duplicate_decorrelation():
    """CBGSWrapper must forward the train loop's epoch bumps to the inner
    dataset (the hasattr gate silently skipped it before) and give
    DUPLICATE occurrences of an oversampled frame different augmentation
    draws (they were byte-identical: the rng was keyed only on the inner
    index)."""
    from collections import Counter

    from srfdet3d_tpu.configs import tiny_test_config
    from srfdet3d_tpu.data import CBGSWrapper, SyntheticDataset

    cfg = tiny_test_config()
    ds = SyntheticDataset(cfg, length=6, augment=True)
    w = CBGSWrapper(ds)
    w.epoch = 3
    assert ds.epoch == 3

    counts = Counter(w.indices)
    inner, n = counts.most_common(1)[0]
    if n >= 2:
        outer = [i for i, v in enumerate(w.indices) if v == inner][:2]
        a, b = w[outer[0]], w[outer[1]]
        assert not np.array_equal(a["points"], b["points"])
    # same outer index twice -> deterministic
    c, d = w[0], w[0]
    np.testing.assert_array_equal(c["points"], d["points"])
