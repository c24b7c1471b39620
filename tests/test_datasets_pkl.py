"""Info-pickle dataset loaders on synthetic archives (nuScenes/KITTI)."""
import os
import pickle

import numpy as np
import pytest

from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.data import KittiDataset, NuScenesDataset
from srfdet3d_tpu.data.transforms import DBSampler


def _write_bin(path, n, dim, rng):
    pts = np.zeros((n, dim), np.float32)
    pts[:, 0:2] = rng.uniform(-9, 9, (n, 2))
    pts[:, 2] = rng.uniform(-3, 1, n)
    if dim > 3:
        pts[:, 3:] = rng.uniform(0, 1, (n, dim - 3))
    pts.tofile(path)
    return pts


def test_nuscenes_dataset_from_infos(tmp_path):
    rng = np.random.default_rng(0)
    cfg = tiny_test_config()
    lidar = str(tmp_path / "lidar0.bin")
    _write_bin(lidar, 3000, 5, rng)
    sweep = str(tmp_path / "sweep0.bin")
    _write_bin(sweep, 1000, 5, rng)
    infos = {"infos": [{
        "lidar_path": lidar,
        "sweeps": [{"data_path": sweep,
                    "sensor2lidar_rotation": np.eye(3),
                    "sensor2lidar_translation": np.zeros(3),
                    "timestamp": 0}],
        "gt_boxes": np.array([[1.0, 2.0, -1.5, 1.8, 4.2, 1.6, 0.3]]),
        "gt_velocity": np.array([[1.0, 0.5]]),
        "gt_names": np.array(["car"]),
        "valid_flag": np.array([True]),
    }], "metadata": {"version": "test"}}
    info_path = str(tmp_path / "infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)

    cfg = cfg.replace(class_names=("car", "pedestrian", "cyclist"))
    ds = NuScenesDataset(cfg, info_path=info_path, data_root=str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    assert s["points"].shape == (cfg.points_cap, cfg.points_dim)
    assert s["points_mask"].sum() > 1000
    assert s["gt_mask"].sum() == 1
    assert s["gt_labels"][0] == 0
    # gravity-center conversion applied (+h/2 over some rot/trans jitter)
    assert abs(s["gt_boxes"][0, 5] - 1.6) < 0.4


def test_kitti_dataset_from_infos(tmp_path):
    rng = np.random.default_rng(1)
    cfg = tiny_test_config().replace(points_dim=4)
    velo = str(tmp_path / "000000.bin")
    _write_bin(velo, 2000, 4, rng)
    infos = [{
        "point_cloud": {"velodyne_path": velo},
        "annos": {"gt_boxes_lidar":
                  np.array([[2.0, 1.0, -1.0, 1.6, 3.9, 1.5, -0.2]]),
                  "name": np.array(["Car"])},
        "image": {"image_path": None},
        "calib": {"P2": np.eye(4), "R0_rect": np.eye(4),
                  "Tr_velo_to_cam": np.eye(4)[:3]},
    }]
    info_path = str(tmp_path / "kitti_infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    cfg = cfg.replace(class_names=("Pedestrian", "Cyclist", "Car"))
    ds = KittiDataset(cfg, info_path=info_path, data_root=str(tmp_path))
    s = ds[0]
    assert s["points"].shape == (cfg.points_cap, 4)
    assert s["gt_mask"].sum() == 1
    assert s["gt_labels"][0] == 2      # Car


def test_db_sampler_pastes_objects(tmp_path):
    rng = np.random.default_rng(2)
    # object point file: 50 points near origin (box-relative)
    obj = str(tmp_path / "car_0.bin")
    opts = np.zeros((50, 5), np.float32)
    opts[:, :3] = rng.uniform(-0.5, 0.5, (50, 3))
    opts.tofile(obj)
    db = {"car": [{"path": "car_0.bin",
                   "box3d_lidar": np.array(
                       [5.0, 5.0, -1.0, 1.8, 4.0, 1.5, 0.0], np.float32),
                   "num_points_in_gt": 50}]}
    db_path = str(tmp_path / "db.pkl")
    with open(db_path, "wb") as f:
        pickle.dump(db, f)

    sampler = DBSampler(info_path=db_path, data_root=str(tmp_path),
                        classes=("car",), sample_groups={"car": 2})
    points = rng.uniform(-9, 9, (500, 5)).astype(np.float32)
    gt = np.zeros((0, 7), np.float32)
    labels = np.zeros((0,), np.int64)
    p2, b2, l2 = sampler.apply(points, gt, labels, rng)
    assert len(b2) == 1 and l2[0] == 0
    assert len(p2) > len(points) - 50   # object points pasted
    # pasted points moved to the box location
    assert np.linalg.norm(p2[:50, :2].mean(0) - [5.0, 5.0]) < 1.0
