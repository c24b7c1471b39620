"""Dataset-level visualization smoke test (VERDICT r1 item 8): dataset.show
writes BEV + per-camera overlay PNGs and 3D scene files for a synthetic
nuScenes-style frame (reference nuscenes_dataset.py:119-239)."""
import os
import pickle

import numpy as np

from srfdet3d_tpu.config import ImgBranchConfig
from srfdet3d_tpu.configs import tiny_test_config
from srfdet3d_tpu.data import NuScenesDataset


def _synthetic_nus_infos(tmp_path, rng, with_cams: bool):
    lidar = str(tmp_path / "lidar0.bin")
    pts = np.zeros((3000, 5), np.float32)
    pts[:, 0:2] = rng.uniform(-9, 9, (3000, 2))
    pts[:, 2] = rng.uniform(-3, 1, 3000)
    pts.tofile(lidar)
    info = {
        "lidar_path": lidar,
        "sweeps": [],
        "gt_boxes": np.array([[1.0, 2.0, -1.5, 1.8, 4.2, 1.6, 0.3],
                              [-3.0, 4.0, -1.2, 0.6, 0.8, 1.7, -0.5]]),
        "gt_velocity": np.zeros((2, 2)),
        "gt_names": np.array(["car", "pedestrian"]),
        "valid_flag": np.array([True, True]),
    }
    if with_cams:
        from PIL import Image
        cam_img = str(tmp_path / "cam0.jpg")
        Image.fromarray(
            rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)).save(cam_img)
        intr = np.array([[50.0, 0, 40], [0, 50.0, 30], [0, 0, 1.0]])
        info["cams"] = {cam: {
            "data_path": cam_img,
            "sensor2lidar_rotation": np.eye(3),
            "sensor2lidar_translation": np.zeros(3),
            "cam_intrinsic": intr,
        } for cam in ("CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                      "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")}
    info_path = str(tmp_path / "infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump({"infos": [info], "metadata": {}}, f)
    return info_path


def test_dataset_show_writes_bev_and_camera_overlays(tmp_path):
    rng = np.random.default_rng(0)
    cfg = tiny_test_config().replace(
        class_names=("car", "pedestrian", "cyclist"),
        use_img=True,
        img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=6,
                            img_shape=(60, 80)))
    info_path = _synthetic_nus_infos(tmp_path, rng, with_cams=True)
    ds = NuScenesDataset(cfg, info_path=info_path, data_root=str(tmp_path),
                         test_mode=True)
    results = [{
        "boxes": np.array([[1.1, 2.1, -1.4, 1.8, 4.2, 1.6, 0.3],
                           [5.0, -5.0, -1.0, 0.6, 0.8, 1.7, 0.0]]),
        "scores": np.array([0.9, 0.05]),       # second below threshold
        "labels": np.array([0, 1]),
    }]
    out_dir = str(tmp_path / "vis")
    n = ds.show(results, out_dir, score_thr=0.2, save_3d=True)
    assert n == 1
    files = sorted(os.listdir(out_dir))
    assert "00000_bev.png" in files
    for v in range(1, 7):
        assert f"00000_v{v}.png" in files
    assert "00000_points.obj" in files
    assert "00000_gt.ply" in files
    assert "00000_pred.ply" in files
    import cv2
    bev = cv2.imread(os.path.join(out_dir, "00000_bev.png"))
    assert bev is not None and (bev > 0).any()
    cam = cv2.imread(os.path.join(out_dir, "00000_v1.png"))
    assert cam is not None and cam.shape == (60, 80, 3)
