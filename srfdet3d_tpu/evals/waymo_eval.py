"""Native Waymo detection metrics (AP / APH, LEVEL_1 / LEVEL_2).

Replaces the Waymo C++ `compute_detection_metrics_main` bazel binary the
reference shells out to (README.md:72-93).  Protocol:

  - match by 3D IoU: Car/Vehicle 0.7, Pedestrian/Cyclist 0.5, greedy in
    score order,
  - LEVEL_2 = all GTs; LEVEL_1 = GTs with > 5 lidar points (and not marked
    difficulty 2),
  - AP = 101-point interpolated PR area; APH weights each TP by heading
    accuracy (1 - |Δyaw_wrapped| / pi) on BOTH axes — precision
    Σh / (tp + fp) and recall Σh / npos — matching the official
    compute_detection_metrics semantics (a 90°-heading detector halves
    recall too, not just precision).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

from ..geometry.iou import iou_3d

IOU_THRESHOLDS = {"Car": 0.7, "Vehicle": 0.7, "Pedestrian": 0.5,
                  "Cyclist": 0.5}


def _heading_acc(yaw_p: float, yaw_g: float) -> float:
    d = abs(yaw_p - yaw_g) % (2 * np.pi)
    d = min(d, 2 * np.pi - d)
    return max(0.0, 1.0 - d / np.pi)


def _pr_area(weights: np.ndarray, is_tp: np.ndarray, scores: np.ndarray,
             npos: int) -> float:
    if npos == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp_w = np.cumsum(np.where(is_tp[order], weights[order], 0.0))
    fp = np.cumsum(~is_tp[order]).astype(float)
    tp = np.cumsum(is_tp[order]).astype(float)
    rec = tp_w / npos                 # heading-weighted recall (APH)
    prec_w = tp_w / np.maximum(tp + fp, 1e-9)
    rec_i = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_i, rec, prec_w, right=0.0)
    # monotone envelope
    for i in range(len(prec_i) - 2, -1, -1):
        prec_i[i] = max(prec_i[i], prec_i[i + 1])
    return float(np.mean(prec_i))


def waymo_eval(gts: List[Dict], preds: List[Dict],
               class_names: Sequence[str] = ("Car", "Pedestrian",
                                             "Cyclist")) -> Dict:
    """gts: {"boxes" (N, 7) with GRAVITY-center z (iou_3d derives z
    extents as cz -/+ h/2), "labels_name", optional "num_points" (N,),
    optional "difficulty" (N,)}; preds add "scores".

    Returns {"{cls}_AP_L1", "{cls}_APH_L1", "{cls}_AP_L2", "{cls}_APH_L2",
    "mAPH_L1", "mAPH_L2"}.
    """
    out = {}
    for cls in class_names:
        thr = IOU_THRESHOLDS.get(cls, 0.5)
        # IoU depends only on (frame, class) — compute once, reuse for
        # both levels (one eager JAX dispatch per frame)
        frames = []
        for g, p in zip(gts, preds):
            g_sel = np.nonzero(g["labels_name"] == cls)[0]
            p_sel = np.nonzero(p["labels_name"] == cls)[0]
            p_order = p_sel[np.argsort(-p["scores"][p_sel])]
            if len(g_sel) and len(p_order):
                ious = np.asarray(iou_3d(
                    jnp.asarray(p["boxes"][p_order][:, :7]),
                    jnp.asarray(g["boxes"][g_sel][:, :7])))
            else:
                ious = np.zeros((len(p_order), len(g_sel)))
            frames.append((g, p, g_sel, p_order, ious))
        for level in (1, 2):
            is_tp, weights, scores = [], [], []
            npos = 0
            for g, p, g_sel, p_order, ious in frames:
                npts = np.asarray(g.get("num_points",
                                        np.full(len(g["boxes"]), 100)))
                diff = np.asarray(g.get("difficulty",
                                        np.zeros(len(g["boxes"]))))
                if level == 1:
                    lvl_ok = (npts > 5) & (diff < 2)
                else:
                    lvl_ok = np.ones(len(g["boxes"]), bool)
                npos += int(lvl_ok[g_sel].sum()) if len(g_sel) else 0
                if len(p_order) == 0:
                    continue
                taken = np.zeros(len(g_sel), bool)

                def best(pi, want_valid):
                    bi, bv = -1, thr
                    for gi in range(len(g_sel)):
                        if taken[gi] or \
                                bool(lvl_ok[g_sel[gi]]) != want_valid:
                            continue
                        if ious[pi, gi] >= bv:
                            bv, bi = ious[pi, gi], gi
                    return bi

                for pi in range(len(p_order)):
                    # valid (in-level) GTs first: an out-of-level GT must
                    # not steal a detection a counted GT can claim
                    gi = best(pi, True)
                    if gi >= 0:
                        taken[gi] = True
                        is_tp.append(True)
                        scores.append(float(p["scores"][p_order[pi]]))
                        weights.append(_heading_acc(
                            float(p["boxes"][p_order[pi]][6]),
                            float(g["boxes"][g_sel[gi]][6])))
                        continue
                    gi = best(pi, False)
                    if gi >= 0:          # ignored GT absorbs the det
                        taken[gi] = True
                        continue
                    is_tp.append(False)
                    weights.append(0.0)
                    scores.append(float(p["scores"][p_order[pi]]))
            is_tp_a = np.asarray(is_tp, bool)
            w_a = np.asarray(weights)
            s_a = np.asarray(scores)
            out[f"{cls}_AP_L{level}"] = _pr_area(
                np.ones_like(w_a), is_tp_a, s_a, npos)
            out[f"{cls}_APH_L{level}"] = _pr_area(w_a, is_tp_a, s_a, npos)
    for level in (1, 2):
        out[f"mAPH_L{level}"] = float(np.mean(
            [out[f"{c}_APH_L{level}"] for c in class_names]))
    return out
