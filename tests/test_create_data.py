"""tools/create_data.py round trips: raw dataset trees -> info pkls that
(a) invert the label-frame transforms exactly (fixtures are generated
FORWARD from known lidar-frame boxes, the creator converts BACK), and
(b) feed the real dataset classes end-to-end."""
import json
import os
import pickle

import numpy as np
import pytest

from tools.create_data import main as create_main


# ------------------------------------------------------------------ KITTI

def _rot_z(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _kitti_fixture(root, lidar_boxes, names):
    """Raw KITTI tree for one frame; labels generated from LIDAR boxes."""
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as f:
        f.write("000000\n")
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("000000\n")

    # velo->cam: the standard KITTI-style axis swap plus a small extra
    # rotation and offset; R0 a small rectification rotation
    tr = np.eye(4)
    tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    tr[:3, :3] = tr[:3, :3] @ _rot_z(0.02)
    tr[:3, 3] = [0.27, -0.08, -0.9]
    r0 = np.eye(4)
    r0[:3, :3] = _rot_z(0.01) @ np.array(
        [[1, 0, 0], [0, np.cos(0.015), -np.sin(0.015)],
         [0, np.sin(0.015), np.cos(0.015)]])
    p2 = np.array([[720.0, 0, 610, 45], [0, 720, 175, 0.1],
                   [0, 0, 1, 0.003]])

    def fmt(mat, rows, cols):
        return " ".join(f"{v:.12e}" for v in
                        np.asarray(mat, np.float64)[:rows, :cols].reshape(-1))

    with open(os.path.join(root, "training", "calib", "000000.txt"),
              "w") as f:
        for k in ("P0", "P1", "P2", "P3"):
            f.write(f"{k}: {fmt(p2, 3, 4)}\n")
        f.write(f"R0_rect: {fmt(r0, 3, 3)}\n")
        f.write(f"Tr_velo_to_cam: {fmt(tr, 3, 4)}\n")

    # FORWARD transform lidar -> camera labels (inverse of the creator)
    lines = []
    heights_2d = (60.0, 30.0)                  # easy, moderate
    for b, name, h2d in zip(lidar_boxes, names, heights_2d):
        x, y, z, l, w, h, yaw = b
        loc_cam = (r0 @ tr @ np.array([x, y, z, 1.0]))[:3]
        rot_y = -yaw - np.pi / 2
        rot_y = rot_y - np.floor(rot_y / (2 * np.pi) + 0.5) * 2 * np.pi
        occ = 0 if h2d >= 40 else 1
        trunc = 0.0 if h2d >= 40 else 0.2
        lines.append(
            f"{name} {trunc:.2f} {occ} 0.0 300.0 150.0 360.0 "
            f"{150.0 + h2d:.1f} {h:.6f} {w:.6f} {l:.6f} "
            f"{loc_cam[0]:.6f} {loc_cam[1]:.6f} {loc_cam[2]:.6f} "
            f"{rot_y:.6f}")
    lines.append("DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 "
                 "-1000 -10")
    with open(os.path.join(root, "training", "label_2", "000000.txt"),
              "w") as f:
        f.write("\n".join(lines) + "\n")

    # points: background + a cluster inside each box
    rng = np.random.default_rng(0)
    pts = [rng.uniform([-2, -20, -2.5, 0], [60, 20, 1.5, 1],
                       size=(600, 4)).astype(np.float32)]
    for b in lidar_boxes:
        n = 40
        local = rng.uniform([-0.4, -0.4, 0.1], [0.4, 0.4, 0.9],
                            size=(n, 3)) * np.asarray(b[3:6])
        rot = _rot_z(b[6])[:2, :2]
        xy = local[:, :2] @ rot.T + np.asarray(b[:2])
        z = local[:, 2] + b[2]
        pts.append(np.concatenate(
            [xy, z[:, None], np.full((n, 1), 0.5)], axis=1
        ).astype(np.float32))
    np.concatenate(pts).astype(np.float32).tofile(
        os.path.join(root, "training", "velodyne", "000000.bin"))


def test_kitti_create_data_roundtrip(tmp_path):
    root = os.path.join(tmp_path, "kitti")
    lidar_boxes = np.array([
        [12.0, 3.0, -1.4, 4.2, 1.8, 1.6, 0.4],
        [25.0, -6.0, -1.2, 0.8, 0.7, 1.7, -2.2],
    ], np.float64)
    names = ("Car", "Pedestrian")
    _kitti_fixture(root, lidar_boxes, names)
    create_main(["kitti", "--root", root, "--with-db"])

    with open(os.path.join(root, "kitti_infos_train.pkl"), "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    ann = infos[0]["annos"]
    assert list(ann["name"]) == list(names)          # DontCare dropped
    np.testing.assert_allclose(ann["gt_boxes_lidar"], lidar_boxes,
                               rtol=1e-4, atol=1e-4)
    assert ann["difficulty"][0] == 0 and ann["difficulty"][1] == 1

    # the real dataset class consumes the infos end-to-end
    from srfdet3d_tpu.configs import tiny_kitti_test_config
    from srfdet3d_tpu.data import KittiDataset
    cfg = tiny_kitti_test_config()
    ds = KittiDataset(cfg, info_path=os.path.join(
        root, "kitti_infos_train.pkl"), data_root=root, augment=False)
    s = ds[0]
    assert s["points_mask"].any()
    assert s["gt_mask"].sum() >= 1               # in-range boxes survived

    # GT database feeds the DBSampler paste path
    with open(os.path.join(root, "kitti_dbinfos_train.pkl"), "rb") as f:
        db = pickle.load(f)
    assert db["Car"][0]["num_points_in_gt"] >= 30
    from srfdet3d_tpu.data.transforms import DBSampler
    sampler = DBSampler(
        info_path=os.path.join(root, "kitti_dbinfos_train.pkl"),
        data_root=root, classes=("Pedestrian", "Cyclist", "Car"),
        sample_groups={"Car": 2}, min_points={"Car": 5},
        points_load_dim=4, points_use_dim=(0, 1, 2, 3))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 50, size=(100, 4)).astype(np.float32)
    p2, b2, l2 = sampler.apply(
        pts, np.zeros((0, 7), np.float32), np.zeros((0,), np.int64), rng)
    assert len(b2) >= 1 and len(p2) > len(pts) - 50


# --------------------------------------------------------------- nuScenes

def _yaw_quat(t):
    return [float(np.cos(t / 2)), 0.0, 0.0, float(np.sin(t / 2))]


def _nusc_fixture(root, lidar_boxes, vel_xy, ego_yaw=0.7,
                  ego_t=(100.0, 50.0, 0.0)):
    """Mini nuScenes table set: 1 scene, 3 samples (for velocity's
    central difference), LIDAR_TOP keyframes + one prev sweep, one cam.
    Boxes are placed in the MIDDLE sample's lidar frame and transformed
    forward to global annotations; the instance moves at constant global
    velocity so the devkit central difference is exact."""
    from tools.create_data import _pose_mat

    vdir = os.path.join(root, "v1.0-mini")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps", "LIDAR_TOP"), exist_ok=True)

    l2e = _pose_mat(_yaw_quat(0.05), [0.9, 0.0, 1.8])   # lidar->ego
    tables = {k: [] for k in
              ("scene", "sample", "sample_data", "ego_pose",
               "calibrated_sensor", "sensor", "sample_annotation",
               "instance", "category", "attribute", "visibility", "log",
               "map")}
    tables["sensor"].append({"token": "sen_lidar", "channel": "LIDAR_TOP",
                             "modality": "lidar"})
    tables["sensor"].append({"token": "sen_cam", "channel": "CAM_FRONT",
                             "modality": "camera"})
    tables["calibrated_sensor"].append({
        "token": "cs_lidar", "sensor_token": "sen_lidar",
        "rotation": _yaw_quat(0.05), "translation": [0.9, 0.0, 1.8],
        "camera_intrinsic": []})
    tables["calibrated_sensor"].append({
        "token": "cs_cam", "sensor_token": "sen_cam",
        "rotation": _yaw_quat(-1.57), "translation": [1.5, 0.2, 1.6],
        "camera_intrinsic": [[1250.0, 0, 800], [0, 1250, 450], [0, 0, 1]]})

    stoks = ["smp0", "smp1", "smp2"]
    times = [1000000, 1500000, 2000000]
    cat_tok = "cat_car"
    tables["category"].append({"token": cat_tok, "name": "vehicle.car"})
    tables["instance"] = [{"token": f"inst{i}", "category_token": cat_tok,
                           "nbr_annotations": 3}
                          for i in range(len(lidar_boxes))]

    # the middle sample's lidar->global
    e2g_mid = _pose_mat(_yaw_quat(ego_yaw), list(ego_t))
    l2g_mid = e2g_mid @ l2e

    anns_by_sample = {s: [] for s in stoks}
    ann_rows = {}
    for bi, (b, v) in enumerate(zip(lidar_boxes, vel_xy)):
        x, y, z, l, w, h, yaw = b
        c_mid = (l2g_mid @ np.array([x, y, z, 1.0]))[:3]
        r_g = l2g_mid[:3, :3] @ np.array(
            [[np.cos(yaw), -np.sin(yaw), 0],
             [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        yaw_g = float(np.arctan2(r_g[1, 0], r_g[0, 0]))
        v_g = l2g_mid[:3, :3] @ np.array([v[0], v[1], 0.0])
        for si, (stok, t_us) in enumerate(zip(stoks, times)):
            dt = (t_us - times[1]) / 1e6
            tok = f"ann{bi}_{si}"
            ann_rows[tok] = {
                "token": tok, "sample_token": stok,
                "instance_token": f"inst{bi}",
                "translation": list(c_mid + v_g * dt),
                "size": [w, l, h],               # devkit order w, l, h
                "rotation": _yaw_quat(yaw_g),
                "prev": f"ann{bi}_{si - 1}" if si else "",
                "next": f"ann{bi}_{si + 1}" if si < 2 else "",
                "num_lidar_pts": 10, "num_radar_pts": 2,
                "visibility_token": "4", "attribute_tokens": []}
            anns_by_sample[stok].append(tok)
    tables["sample_annotation"] = list(ann_rows.values())

    tables["scene"].append({
        "token": "scene0", "name": "scene-0001", "log_token": "log0",
        "nbr_samples": 3, "first_sample_token": stoks[0],
        "last_sample_token": stoks[-1]})
    rng = np.random.default_rng(7)
    for si, (stok, t_us) in enumerate(zip(stoks, times)):
        tables["sample"].append({
            "token": stok, "timestamp": t_us, "scene_token": "scene0",
            "prev": stoks[si - 1] if si else "",
            "next": stoks[si + 1] if si < 2 else "",
            "anns": anns_by_sample[stok]})
        # every sample uses the SAME ego pose trick would hide transform
        # bugs — give each its own pose; the middle one is e2g_mid
        yawi = ego_yaw + 0.1 * (si - 1)
        ti = np.asarray(ego_t) + [5.0 * (si - 1), -2.0 * (si - 1), 0.0]
        pose = _yaw_quat(yawi), list(map(float, ti))
        if si == 1:
            pose = _yaw_quat(ego_yaw), list(ego_t)
        tables["ego_pose"].append({
            "token": f"ep{si}", "timestamp": t_us,
            "rotation": pose[0], "translation": pose[1]})
        lp = f"samples/LIDAR_TOP/f{si}.bin"
        rng.uniform(-30, 30, size=(256, 5)).astype(np.float32).tofile(
            os.path.join(root, lp))
        tables["sample_data"].append({
            "token": f"sd_l{si}", "sample_token": stok,
            "ego_pose_token": f"ep{si}",
            "calibrated_sensor_token": "cs_lidar", "filename": lp,
            "fileformat": "bin", "is_key_frame": True,
            "timestamp": t_us, "prev": f"sd_ls{si}" if si == 1 else "",
            "next": ""})
        tables["sample_data"].append({
            "token": f"sd_c{si}", "sample_token": stok,
            "ego_pose_token": f"ep{si}",
            "calibrated_sensor_token": "cs_cam",
            "filename": f"samples/CAM_FRONT/f{si}.jpg",
            "fileformat": "jpg", "is_key_frame": True,
            "timestamp": t_us, "prev": "", "next": ""})
    # one non-keyframe sweep before sample 1
    sp = "sweeps/LIDAR_TOP/s1.bin"
    rng.uniform(-30, 30, size=(128, 5)).astype(np.float32).tofile(
        os.path.join(root, sp))
    tables["ego_pose"].append({
        "token": "ep_s1", "timestamp": times[1] - 100000,
        "rotation": _yaw_quat(ego_yaw - 0.02),
        "translation": [ego_t[0] - 1.0, ego_t[1] + 0.5, ego_t[2]]})
    tables["sample_data"].append({
        "token": "sd_ls1", "sample_token": stoks[1],
        "ego_pose_token": "ep_s1", "calibrated_sensor_token": "cs_lidar",
        "filename": sp, "fileformat": "bin", "is_key_frame": False,
        "timestamp": times[1] - 100000, "prev": "", "next": "sd_l1"})

    for name, rows in tables.items():
        with open(os.path.join(vdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return l2g_mid


def test_nuscenes_create_data_roundtrip(tmp_path):
    root = os.path.join(tmp_path, "nusc")
    lidar_boxes = np.array([
        [8.0, -3.0, 0.2, 4.5, 1.9, 1.7, 1.1],     # gravity-center z
        [-11.0, 6.0, 0.5, 6.8, 2.4, 2.9, -0.6],
    ], np.float64)
    vel_xy = np.array([[3.0, -1.0], [0.5, 2.0]], np.float64)
    _nusc_fixture(root, lidar_boxes, vel_xy)
    create_main(["nuscenes", "--root", root, "--version", "v1.0-mini",
                 "--max-sweeps", "3"])

    paths = [os.path.join(root, f"nuscenes_infos_{s}.pkl")
             for s in ("train", "val")]
    infos = sum((pickle.load(open(p, "rb")) for p in paths), [])
    assert len(infos) == 3
    mid = next(i for i in infos if i["token"] == "smp1")

    order = np.argsort(mid["gt_boxes"][:, 0])
    want_order = np.argsort(lidar_boxes[:, 0])
    np.testing.assert_allclose(mid["gt_boxes"][order],
                               lidar_boxes[want_order],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mid["gt_velocity"][order],
                               vel_xy[want_order], rtol=1e-5, atol=1e-5)
    assert list(mid["gt_names"]) == ["car", "car"]
    assert mid["valid_flag"].all()
    assert len(mid["sweeps"]) == 1               # the one prev sweep
    assert "CAM_FRONT" in mid["cams"]

    # dataset class end-to-end (LiDAR-only tiny config)
    from srfdet3d_tpu.configs import tiny_test_config
    from srfdet3d_tpu.data import NuScenesDataset
    cfg = tiny_test_config()
    cfg = cfg.replace(pc_range=(-56.0, -56.0, -6.0, 56.0, 56.0, 6.0),
                      class_names=("car",))
    with open(os.path.join(root, "mid_only.pkl"), "wb") as f:
        pickle.dump([mid], f)
    ds = NuScenesDataset(cfg, info_path=os.path.join(root, "mid_only.pkl"),
                         data_root=root, augment=False)
    s = ds[0]
    assert s["gt_mask"].sum() == 2
    got = s["gt_boxes"][s["gt_mask"]]
    # pipeline keeps gravity-center z and appends velocities
    np.testing.assert_allclose(
        np.sort(got[:, 0]), np.sort(lidar_boxes[:, 0].astype(np.float32)),
        atol=1e-4)
    np.testing.assert_allclose(np.sort(got[:, 7] ** 2 + got[:, 8] ** 2),
                               np.sort((vel_xy ** 2).sum(1)), rtol=1e-4)


def test_kitti_sync_flip_2d_projection_consistency(tmp_path):
    """kitti_LC synced 2D/3D flip (reference RandomFlip3D sync_2d,
    srfdet_voxel_kitti_LC.py:256; plugin transform_3d.py:374-430): with
    the flip forced on, (a) the flipped GT box's center projected through
    the compensated lidar2img lands exactly on the mirrored pixel of the
    unflipped projection, and (b) the image content is mirrored about the
    RAW width (padding stays on the right edge, reference pipeline order
    flip -> pad)."""
    import dataclasses
    from PIL import Image
    root = os.path.join(tmp_path, "kitti")
    lidar_boxes = np.array([
        [12.0, 3.0, -1.4, 4.2, 1.8, 1.6, 0.4],
        [15.0, -6.0, -1.2, 0.8, 0.7, 1.7, -2.2],
    ], np.float64)
    _kitti_fixture(root, lidar_boxes, ("Car", "Pedestrian"))
    # raw 100x160 gradient image (pads to 128x160)
    w0, h0 = 160, 100
    grad = (np.arange(h0 * w0 * 3).reshape(h0, w0, 3) % 255).astype(
        np.uint8)
    Image.fromarray(grad).save(
        os.path.join(root, "training", "image_2", "000000.png"))
    create_main(["kitti", "--root", root])

    from srfdet3d_tpu.configs import tiny_kitti_test_config
    from srfdet3d_tpu.config import AugConfig, ImgBranchConfig
    from srfdet3d_tpu.data import KittiDataset

    def build(flip_ratio):
        cfg = tiny_kitti_test_config().replace(
            use_img=True,
            img=ImgBranchConfig(backbone="vovnet-19-slim", num_cams=1,
                                img_shape=(128, 160), mode="pad"),
            aug=dataclasses.replace(AugConfig.none(),
                                    flip_horizontal=flip_ratio,
                                    sync_flip_2d=True))
        return KittiDataset(cfg, info_path=os.path.join(
            root, "kitti_infos_train.pkl"), data_root=root, augment=True)

    s_plain = build(0.0)[0]
    s_flip = build(1.0)[0]

    # (a) 3D geometry flipped
    g0 = s_plain["gt_boxes"][s_plain["gt_mask"]]
    g1 = s_flip["gt_boxes"][s_flip["gt_mask"]]
    assert len(g0) == len(g1) >= 1
    np.testing.assert_allclose(g1[:, 1], -g0[:, 1], atol=1e-5)
    np.testing.assert_allclose(g1[:, 6], -g0[:, 6], atol=1e-5)

    # (b) projection consistency: project each GT center through its
    # sample's lidar2img; flipped projection = mirrored unflipped one
    def project(l2i, xyz):
        hom = np.concatenate([xyz, np.ones((len(xyz), 1))], axis=1)
        cam = hom @ l2i.T
        return cam[:, :2] / cam[:, 2:3], cam[:, 2]

    uv0, z0 = project(s_plain["lidar2img"][0], g0[:, :3])
    uv1, z1 = project(s_flip["lidar2img"][0], g1[:, :3])
    np.testing.assert_allclose(z1, z0, rtol=1e-5)          # depth same
    np.testing.assert_allclose(uv1[:, 1], uv0[:, 1], rtol=1e-5)  # v same
    np.testing.assert_allclose(uv1[:, 0], (w0 - 1) - uv0[:, 0],
                               rtol=1e-5)                  # u mirrored

    # (c) image content mirrored inside the raw region, pad untouched
    im0 = s_plain["images"][0]
    im1 = s_flip["images"][0]
    np.testing.assert_allclose(im1[:h0, :w0], im0[:h0, :w0][:, ::-1],
                               atol=1e-6)
    np.testing.assert_allclose(im1[h0:], 0.0, atol=1e-6)
    np.testing.assert_allclose(im1[:, w0:], 0.0, atol=1e-6)
