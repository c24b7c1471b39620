"""Native KITTI 3D AP (R40) evaluation.

Replaces the mmdet3d kitti eval the reference reaches via
`dataset.evaluate()` (tools/test.py:243-252).  Protocol:

  - class-specific 3D IoU thresholds: Car 0.7, Pedestrian/Cyclist 0.5,
  - three difficulty buckets (easy/moderate/hard) from 2D bbox height /
    occlusion / truncation when provided (when those fields are absent —
    e.g. synthetic data — every GT is valid in ALL three buckets, so the
    three APs coincide),
  - AP_R40: precision interpolated at the 40 recall points 1/40 .. 1,
  - like the official eval, a detection prefers a VALID (in-bucket) GT
    over an ignored harder-bucket one: ignored GTs only absorb detections
    no valid GT claims (absorbed detections count as neither TP nor FP),
  - neighboring-class absorption: "Van" GTs absorb Car detections and
    "Person_sitting" GTs absorb Pedestrian detections when such names
    appear in the GT frames (the official eval's ignored classes); the
    in-repo pipeline maps labels to the 3 eval classes before padding, so
    this only engages for eval-from-pkl consumers carrying raw names.

Deviations from the official devkit, documented: matching is one global
greedy pass over score-sorted detections (like the nuScenes protocol)
instead of re-matching per score threshold (coincides for well-separated
scores); DontCare 2D regions and the minimum-2D-height detection ignore
are not applied (no 2D detection boxes exist in this 3D-only pipeline).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from ..geometry.iou import iou_3d

IOU_THRESHOLDS = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
# official eval's ignored neighboring classes (absorb, never FP/TP)
NEIGHBOR_IGNORED = {"Car": ("Van",), "Pedestrian": ("Person_sitting",)}
# (min bbox height px, max occlusion, max truncation)
DIFFICULTY = {
    "easy": (40, 0, 0.15),
    "moderate": (25, 1, 0.30),
    "hard": (25, 2, 0.50),
}


def _gt_difficulty_mask(frame: Dict, diff: str) -> np.ndarray:
    n = len(frame["boxes"])
    h_min, occ_max, tr_max = DIFFICULTY[diff]
    heights = frame.get("bbox_heights")
    occ = frame.get("occluded")
    tru = frame.get("truncated")
    if heights is None or occ is None or tru is None:
        return np.ones(n, bool)
    return ((np.asarray(heights) >= h_min) &
            (np.asarray(occ) <= occ_max) &
            (np.asarray(tru) <= tr_max))


def _iou3d_np(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    if len(b1) == 0 or len(b2) == 0:
        return np.zeros((len(b1), len(b2)), np.float32)
    return np.asarray(iou_3d(jnp.asarray(b1[:, :7]), jnp.asarray(b2[:, :7])))


def _ap_r40(tp_flags: np.ndarray, scores: np.ndarray, npos: int) -> float:
    if npos == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = np.cumsum(tp_flags[order]).astype(float)
    fp = np.cumsum(~tp_flags[order]).astype(float)
    rec = tp / npos
    prec = tp / (tp + fp)
    # monotone precision envelope
    for i in range(len(prec) - 2, -1, -1):
        prec[i] = max(prec[i], prec[i + 1])
    aps = []
    for r in np.linspace(1.0 / 40, 1.0, 40):
        mask = rec >= r
        aps.append(float(prec[mask].max()) if mask.any() else 0.0)
    return float(np.mean(aps))


def kitti_eval(gts: List[Dict], preds: List[Dict],
               class_names: Sequence[str] = ("Pedestrian", "Cyclist",
                                             "Car")) -> Dict:
    """gts/preds: per-frame dicts with "boxes" (N, 7) with GRAVITY-center
    z — iou_3d derives z extents as cz -/+ h/2, so bottom-center inputs
    get wrong z overlaps whenever pred and GT heights differ (consistency
    between the two is NOT sufficient); "labels_name"; preds add
    "scores"; gts may add "bbox_heights"/"occluded"/"truncated".

    Returns {"{cls}_3d_{difficulty}": AP_R40, ..., "mAP_3d_moderate": ...}.
    """
    results = {}
    for cls in class_names:
        thr = IOU_THRESHOLDS.get(cls, 0.5)
        # the IoU matrix depends only on (frame, class): compute it once
        # and reuse it across the three difficulty buckets (one eager JAX
        # dispatch per frame — tripling it tripled eval wall time)
        ign_names = NEIGHBOR_IGNORED.get(cls, ())
        frames = []
        for g, p in zip(gts, preds):
            g_sel = np.nonzero(g["labels_name"] == cls)[0]
            p_sel = np.nonzero(p["labels_name"] == cls)[0]
            p_order = p_sel[np.argsort(-p["scores"][p_sel])]
            ious = _iou3d_np(p["boxes"][p_order], g["boxes"][g_sel]) \
                if len(g_sel) and len(p_order) else \
                np.zeros((len(p_order), len(g_sel)))
            g_ign = np.nonzero(np.isin(g["labels_name"], ign_names))[0] \
                if ign_names else np.zeros(0, np.int64)
            ious_ign = _iou3d_np(p["boxes"][p_order], g["boxes"][g_ign]) \
                if len(g_ign) and len(p_order) else \
                np.zeros((len(p_order), len(g_ign)))
            frames.append((g, p, g_sel, p_order, ious, ious_ign))
        for diff in DIFFICULTY:
            tp_flags, scores = [], []
            npos = 0
            for g, p, g_sel, p_order, ious, ious_ign in frames:
                g_valid = _gt_difficulty_mask(g, diff)
                g_count = g_sel[g_valid[g_sel]] if len(g_sel) else g_sel
                npos += len(g_count)
                if len(p_order) == 0:
                    continue
                taken = np.zeros(len(g_sel), bool)

                def best(pi, want_valid):
                    bi, bv = -1, thr
                    for gi in range(len(g_sel)):
                        if taken[gi] or \
                                g_valid[g_sel[gi]] != want_valid:
                            continue
                        if ious[pi, gi] >= bv:
                            bv, bi = ious[pi, gi], gi
                    return bi

                for pi in range(len(p_order)):
                    # valid GTs first: an ignored (harder-bucket) GT must
                    # not steal a detection a valid GT can claim
                    gi = best(pi, True)
                    if gi >= 0:
                        taken[gi] = True
                        tp_flags.append(True)
                        scores.append(float(p["scores"][p_order[pi]]))
                        continue
                    gi = best(pi, False)
                    if gi >= 0:         # ignored GT absorbs the detection
                        taken[gi] = True
                        continue
                    if ious_ign.shape[1] and ious_ign[pi].max() >= thr:
                        continue        # neighboring-class absorption
                    tp_flags.append(False)
                    scores.append(float(p["scores"][p_order[pi]]))
            results[f"{cls}_3d_{diff}"] = _ap_r40(
                np.asarray(tp_flags, bool), np.asarray(scores), npos)
    for diff in DIFFICULTY:
        results[f"mAP_3d_{diff}"] = float(np.mean(
            [results[f"{c}_3d_{diff}"] for c in class_names]))
    return results
