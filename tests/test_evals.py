"""Metric tests: perfect predictions score ~1, garbage scores ~0, and
known-partial cases land in between."""
import numpy as np

from srfdet3d_tpu.evals import kitti_eval, nuscenes_eval, waymo_eval


def _frames(rng, n_frames=4, n_obj=6, classes=("car", "pedestrian")):
    gts = []
    for _ in range(n_frames):
        boxes = np.zeros((n_obj, 9), np.float32)
        boxes[:, 0:2] = rng.uniform(-30, 30, (n_obj, 2))
        boxes[:, 2] = rng.uniform(-1, 1, n_obj)
        boxes[:, 3:6] = rng.uniform(1.0, 4.0, (n_obj, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_obj)
        boxes[:, 7:9] = rng.uniform(-2, 2, (n_obj, 2))
        names = np.array([classes[i % len(classes)] for i in range(n_obj)])
        gts.append({"boxes": boxes, "labels_name": names})
    return gts


def _perfect_preds(gts):
    preds = []
    for g in gts:
        preds.append({"boxes": g["boxes"].copy(),
                      "labels_name": g["labels_name"].copy(),
                      "scores": np.linspace(0.9, 0.5, len(g["boxes"]))})
    return preds


def test_nuscenes_perfect():
    rng = np.random.default_rng(0)
    gts = _frames(rng)
    res = nuscenes_eval(gts, _perfect_preds(gts), ("car", "pedestrian"))
    assert res["mAP"] > 0.95
    assert res["NDS"] > 0.9
    assert res["mATE"] < 0.05 and res["mAOE"] < 0.05


def test_nuscenes_garbage():
    rng = np.random.default_rng(1)
    gts = _frames(rng)
    preds = []
    for g in gts:
        p = {"boxes": g["boxes"] + 50.0,   # far away
             "labels_name": g["labels_name"].copy(),
             "scores": np.full(len(g["boxes"]), 0.9)}
        preds.append(p)
    res = nuscenes_eval(gts, preds, ("car", "pedestrian"))
    assert res["mAP"] < 0.05


def test_nuscenes_half_recall():
    rng = np.random.default_rng(2)
    gts = _frames(rng, n_obj=8, classes=("car",))
    preds = []
    for g in gts:
        keep = slice(0, 4)                 # detect half the objects
        preds.append({"boxes": g["boxes"][keep].copy(),
                      "labels_name": g["labels_name"][keep].copy(),
                      "scores": np.full(4, 0.9)})
    res = nuscenes_eval(gts, preds, ("car",))
    assert 0.2 < res["mAP"] < 0.7


def test_kitti_perfect_and_garbage():
    rng = np.random.default_rng(3)
    # official thresholds grid needs >= ~41 valid GTs per class to fill
    # (kitti_eval docstring) — fewer under-reads AP by design
    gts = _frames(rng, n_frames=15, classes=("Car", "Pedestrian"))
    res = kitti_eval(gts, _perfect_preds(gts), ("Car", "Pedestrian"))
    assert res["Car_3d_moderate"] > 0.95
    preds = [{"boxes": g["boxes"] + 50.0,
              "labels_name": g["labels_name"],
              "scores": np.full(len(g["boxes"]), 0.9)} for g in gts]
    res2 = kitti_eval(gts, preds, ("Car", "Pedestrian"))
    assert res2["Car_3d_moderate"] < 0.05


def test_waymo_aph_penalizes_heading():
    rng = np.random.default_rng(4)
    gts = _frames(rng, classes=("Car",))
    for g in gts:
        g["boxes"][:, 4] = g["boxes"][:, 3]   # square BEV footprint
    perfect = _perfect_preds(gts)
    res = waymo_eval(gts, perfect, ("Car",))
    assert res["Car_APH_L2"] > 0.95
    flipped = []
    for p in perfect:
        b = p["boxes"].copy()
        b[:, 6] += np.pi / 2               # 90-degree heading error
        flipped.append({**p, "boxes": b})
    res2 = waymo_eval(gts, flipped, ("Car",))
    assert res2["Car_AP_L2"] > 0.6          # still matches by IoU-ish
    assert res2["Car_APH_L2"] < res2["Car_AP_L2"] * 0.75


def test_nuscenes_absent_class_counts_as_zero_ap():
    """Devkit parity: a class in class_names with ZERO ground truth still
    contributes AP=0 and unit TP errors to the means
    (DetectionMetricData.no_predictions) — it is not skipped."""
    import numpy as np
    from srfdet3d_tpu.evals.nuscenes_eval import nuscenes_eval
    gt = [{"boxes": np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 1.5, 0.0]]),
           "labels_name": np.array(["car"])}]
    pred = [{"boxes": np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 1.5, 0.0]]),
             "scores": np.array([0.9]),
             "labels_name": np.array(["car"])}]
    only_car = nuscenes_eval(gt, pred, ["car"])
    with_ped = nuscenes_eval(gt, pred, ["car", "pedestrian"])
    assert "pedestrian" in with_ped["per_class"]
    assert with_ped["per_class"]["pedestrian"]["AP"] == 0.0
    # mAP halves when the absent class is included
    np.testing.assert_allclose(with_ped["mAP"], only_car["mAP"] / 2.0,
                               rtol=1e-6)
    # absent class contributes unit TP errors to the means
    assert with_ped["mATE"] > only_car["mATE"]
