"""Image pipeline transforms: projection consistency under edits."""
import numpy as np

from srfdet3d_tpu.data import img_transforms as IT
from srfdet3d_tpu.evals.formatters import (format_kitti_results,
                                           format_nuscenes_results)


def _sample(n_cam=2, h=64, w=96):
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
            for _ in range(n_cam)]
    l2i = np.zeros((n_cam, 4, 4), np.float32)
    for i in range(n_cam):
        l2i[i] = np.array([[50, 0, w / 2, 0], [0, 50, h / 2, 0],
                           [0, 0, 1, 0], [0, 0, 0, 1]])
    return {"images": imgs, "lidar2img": l2i}


def _project(l2i, pt):
    v = l2i @ np.array([pt[0], pt[1], pt[2], 1.0])
    return v[:2] / v[2]


def test_pad_and_normalize():
    s = _sample(h=60, w=90)
    s = IT.pad_multiview(s, 32)
    assert s["images"][0].shape == (64, 96, 3)
    s = IT.normalize_multiview(s)
    assert abs(float(np.mean(s["images"][0]))) < 3.0


def test_scale_projection_consistency():
    s = _sample()
    pt = np.array([0.3, 0.1, 5.0])
    uv0 = _project(s["lidar2img"][0], pt)
    rng = np.random.default_rng(1)
    s2 = IT.random_scale_multiview(dict(s), rng, scales=[0.5])
    uv1 = _project(s2["lidar2img"][0], pt)
    np.testing.assert_allclose(uv1, uv0 * 0.5, rtol=1e-5)
    assert s2["images"][0].shape[0] == s["images"][0].shape[0] // 2


def test_resize_projection_consistency():
    s = _sample(h=64, w=96)
    pt = np.array([-0.2, 0.4, 4.0])
    uv0 = _project(s["lidar2img"][0], pt)
    s2 = IT.resize_multiview(dict(s), (32, 48))
    uv1 = _project(s2["lidar2img"][0], pt)
    np.testing.assert_allclose(uv1, uv0 * 0.5, rtol=1e-5)


def test_horizontal_flip_projection():
    s = _sample()
    pt = np.array([0.25, -0.15, 6.0])
    w = s["images"][0].shape[1]
    uv0 = _project(s["lidar2img"][0], pt)
    rng = np.random.default_rng(2)
    s2 = IT.horizontal_flip_multiview(dict(s), rng, flip_ratio=1.0)
    uv1 = _project(s2["lidar2img"][0], pt)
    np.testing.assert_allclose(uv1[0], (w - 1) - uv0[0], rtol=1e-5)
    np.testing.assert_allclose(uv1[1], uv0[1], rtol=1e-5)
    # pixel content mirrored
    np.testing.assert_allclose(s2["images"][0][:, 0], s["images"][0][:, -1])


def test_photometric_and_crop():
    rng = np.random.default_rng(3)
    s = _sample()
    s2 = IT.photometric_distortion(dict(s), rng)
    assert s2["images"][0].shape == s["images"][0].shape
    assert (s2["images"][0] >= 0).all() and (s2["images"][0] <= 255).all()
    s3 = IT.crop_multiview(dict(s), (32, 48))
    assert s3["images"][0].shape == (32, 48, 3)


def test_nuscenes_formatter():
    frames = [{
        "sample_token": "tok0",
        "boxes": np.array([[1, 2, 0.5, 2, 4, 1.5, 0.3, 1.5, 0.0],
                           [5, 5, 0.5, 0.5, 0.5, 1.8, 0.0, 0.0, 0.0]],
                          np.float32),
        "scores": np.array([0.9, 0.7]),
        "labels_name": np.array(["car", "pedestrian"]),
    }]
    sub = format_nuscenes_results(frames)
    anns = sub["results"]["tok0"]
    assert anns[0]["attribute_name"] == "vehicle.moving"     # speed 1.5
    assert anns[1]["attribute_name"] == "pedestrian.standing"
    assert len(anns[0]["rotation"]) == 4


def test_kitti_formatter(tmp_path):
    l2c = np.eye(4, dtype=np.float32)
    # simple camera: x_cam = -y_l, y_cam = -z_l, z_cam = x_l
    l2c[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 100.0
    p2[0, 2], p2[1, 2] = 60.0, 40.0
    frames = [{
        "frame_id": 0,
        "boxes": np.array([[10, 1, -1.5, 1.8, 4.0, 1.6, 0.2]], np.float32),
        "scores": np.array([0.8]),
        "labels_name": np.array(["Car"]),
        "lidar2cam": l2c, "P2": p2,
    }]
    lines = format_kitti_results(frames, out_dir=str(tmp_path))
    assert len(lines[0]) == 1
    parts = lines[0][0].split()
    assert parts[0] == "Car"
    assert len(parts) == 16
    assert (tmp_path / "000000.txt").exists()
