"""Cross-validation of evals/nuscenes_eval.py against an independent,
devkit-structured re-derivation of the official algorithm.

The real nuscenes-devkit is pure Python but NOT installable here (zero
egress), so this fixture re-derives `nuscenes/eval/detection/algo.py`'s
accumulate / calc_ap / calc_tp verbatim-in-structure from the published
algorithm: per-prediction global score order, a (sample, gt) taken-set,
devkit cummean over TP events, confidence-axis error interpolation, the
10% recall/precision floors, and the class-range pre-filter.  It shares
NO code with the production module (which caches per-class distance
matrices and vectorizes the loop), so caching/vectorization bugs there
cannot cancel out here.

Cross-checks run on randomized synthetic scene sets (boxes, scores,
attributes, velocities drawn fresh per case) and assert the FULL metric
surface matches: per-class AP at every threshold is exercised through
mAP, plus NDS and all five TP errors.

Reference protocol under test: `dataset.evaluate()` -> devkit
(reference tools/test.py:243-252).
"""

import numpy as np
import pytest

from srfdet3d_tpu.evals.nuscenes_eval import (
    NUS_CLASS_RANGES, NO_ATTRIBUTE, NO_VELOCITY, YAW_PERIOD_PI,
    nuscenes_eval)

NELEM = 101
MIN_RECALL, MIN_PRECISION = 0.1, 0.1
DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_FIELDS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")


# --------------------------- devkit re-derivation -----------------------

def _dk_cummean(x):
    """devkit utils.cummean: running mean over non-nan entries."""
    x = np.asarray(x, float)
    if np.all(np.isnan(x)):
        return np.ones(len(x))
    sums = np.nancumsum(np.nan_to_num(x, nan=0.0))
    counts = np.cumsum(~np.isnan(x))
    return sums / np.maximum(counts, 1)


def _dk_scale_iou(sp, sg):
    inter = float(np.prod(np.minimum(sp, sg)))
    union = float(np.prod(sp) + np.prod(sg) - inter)
    return inter / max(union, 1e-9)


def _dk_yaw_diff(a, b, period):
    d = (a - b) % period
    return min(d, period - d)


def _dk_no_predictions():
    return dict(recall=np.linspace(0, 1, NELEM),
                precision=np.zeros(NELEM),
                confidence=np.zeros(NELEM),
                trans_err=np.ones(NELEM), scale_err=np.ones(NELEM),
                orient_err=np.ones(NELEM), vel_err=np.ones(NELEM),
                attr_err=np.ones(NELEM))


def _dk_accumulate(gts, preds, class_name, dist_th):
    """Structure-faithful devkit accumulate: one flat list of
    (confidence, sample, index) predictions, greedy nearest-untaken-GT
    matching per prediction, match_data keyed exactly like the devkit."""
    npos = sum(int(np.sum(g["labels_name"] == class_name)) for g in gts)
    if npos == 0:
        return _dk_no_predictions(), npos

    all_preds = []
    for si, p in enumerate(preds):
        for bi in np.nonzero(p["labels_name"] == class_name)[0]:
            all_preds.append((float(p["scores"][bi]), si, int(bi)))
    all_preds.sort(key=lambda t: -t[0])

    taken = set()
    tp, fp, conf = [], [], []
    match_data = {k: [] for k in TP_FIELDS}
    match_data["conf"] = []
    for score, si, bi in all_preds:
        pb = preds[si]["boxes"][bi]
        min_dist = np.inf
        match_gt_idx = None
        g = gts[si]
        for gi in np.nonzero(g["labels_name"] == class_name)[0]:
            if (si, int(gi)) in taken:
                continue
            d = float(np.hypot(pb[0] - g["boxes"][gi, 0],
                               pb[1] - g["boxes"][gi, 1]))
            if d < min_dist:
                min_dist, match_gt_idx = d, int(gi)
        if min_dist < dist_th:
            taken.add((si, match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(score)
            gb = g["boxes"][match_gt_idx]
            match_data["trans_err"].append(min_dist)
            match_data["scale_err"].append(
                1.0 - _dk_scale_iou(pb[3:6], gb[3:6]))
            period = np.pi if class_name in YAW_PERIOD_PI else 2 * np.pi
            match_data["orient_err"].append(
                _dk_yaw_diff(pb[6], gb[6], period))
            if class_name in NO_VELOCITY or len(pb) < 9 or len(gb) < 9:
                match_data["vel_err"].append(np.nan)
            else:
                match_data["vel_err"].append(
                    float(np.hypot(pb[7] - gb[7], pb[8] - gb[8])))
            if class_name in NO_ATTRIBUTE:
                match_data["attr_err"].append(np.nan)
            else:
                pa, ga = preds[si].get("attrs"), g.get("attrs")
                if pa is None or ga is None or \
                        str(ga[match_gt_idx]) == "":
                    match_data["attr_err"].append(np.nan)
                else:
                    match_data["attr_err"].append(
                        0.0 if pa[bi] == ga[match_gt_idx] else 1.0)
            match_data["conf"].append(score)
        else:
            tp.append(0)
            fp.append(1)
            conf.append(score)

    if len(match_data["trans_err"]) == 0:
        return _dk_no_predictions(), npos

    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, NELEM)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)
    out = dict(recall=rec_interp, precision=prec_i, confidence=conf_i)
    for key in TP_FIELDS:
        tmp = _dk_cummean(match_data[key])
        out[key] = np.interp(conf_i[::-1], match_data["conf"][::-1],
                             tmp[::-1])[::-1]
    return out, npos


def _dk_calc_ap(md):
    prec = np.copy(md["precision"])
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _dk_calc_tp(md, field):
    nz = np.nonzero(md["confidence"])[0]
    last_ind = int(nz[-1]) if len(nz) else 0
    first_ind = round(100 * MIN_RECALL) + 1
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[field][first_ind:last_ind + 1]))


def _dk_filter_range(frame, class_ranges):
    if len(frame["boxes"]) == 0:
        return frame
    dist = np.hypot(frame["boxes"][:, 0], frame["boxes"][:, 1])
    keep = np.array([d < class_ranges.get(str(n), 50.0)
                     for d, n in zip(dist, frame["labels_name"])])
    out = dict(frame)
    for k in ("boxes", "scores", "labels_name", "attrs"):
        if k in out and out[k] is not None:
            out[k] = np.asarray(out[k])[keep]
    return out


def _dk_eval(gts, preds, class_names, class_ranges=None):
    """Devkit DetectionEval.main: per-class, per-threshold accumulate;
    mAP over classes x thresholds; TP errors at the 2.0 m threshold."""
    class_ranges = class_ranges or NUS_CLASS_RANGES
    gts = [_dk_filter_range(g, class_ranges) for g in gts]
    preds = [_dk_filter_range(p, class_ranges) for p in preds]
    aps, tp_errs = [], {f: [] for f in TP_FIELDS}
    for cls in class_names:
        for th in DIST_THS:
            md, npos = _dk_accumulate(gts, preds, cls, th)
            aps.append(_dk_calc_ap(md))
            if th == 2.0:
                for f in TP_FIELDS:
                    if (f == "vel_err" and cls in NO_VELOCITY) or \
                            (f == "attr_err" and cls in NO_ATTRIBUTE) or \
                            (f == "orient_err" and cls == "traffic_cone"):
                        continue
                    tp_errs[f].append(_dk_calc_tp(md, f))
    mAP = float(np.mean(aps))
    tp_means = {f: (float(np.mean(v)) if v else 1.0)
                for f, v in tp_errs.items()}
    nds = (5 * mAP + sum(max(0.0, 1.0 - min(1.0, tp_means[f]))
                         for f in TP_FIELDS)) / 10.0
    return {"mAP": mAP, "NDS": nds,
            **{("mATE", "mASE", "mAOE", "mAVE", "mAAE")[i]: tp_means[f]
               for i, f in enumerate(TP_FIELDS)}}


# ------------------------------ cross-checks ----------------------------

CLASSES = ("car", "pedestrian", "barrier", "traffic_cone")
ATTRS = ("vehicle.moving", "vehicle.parked", "pedestrian.standing", "")


def _random_frames(rng, n_frames, classes, max_gt=8, max_pred=14):
    gts, preds = [], []
    for _ in range(n_frames):
        ng = int(rng.integers(0, max_gt))
        gb = np.zeros((ng, 9), np.float32)
        gb[:, 0:2] = rng.uniform(-45, 45, (ng, 2))
        gb[:, 2] = rng.uniform(-2, 1, ng)
        gb[:, 3:6] = rng.uniform(0.5, 5.0, (ng, 3))
        gb[:, 6] = rng.uniform(-np.pi, np.pi, ng)
        gb[:, 7:9] = rng.normal(0, 2, (ng, 2))
        gnames = rng.choice(classes, ng)
        gattrs = rng.choice(ATTRS, ng)
        gts.append({"boxes": gb, "labels_name": gnames, "attrs": gattrs})
        np_ = int(rng.integers(0, max_pred))
        pb = np.zeros((np_, 9), np.float32)
        # half the predictions perturb a GT, half are random
        for i in range(np_):
            if ng and rng.random() < 0.55:
                src = gb[rng.integers(0, ng)]
                pb[i] = src + np.concatenate(
                    [rng.normal(0, 1.2, 3), rng.normal(0, 0.4, 3),
                     rng.normal(0, 0.5, 1), rng.normal(0, 1, 2)])
                pb[i, 3:6] = np.abs(pb[i, 3:6]) + 0.2
            else:
                pb[i, 0:2] = rng.uniform(-45, 45, 2)
                pb[i, 3:6] = rng.uniform(0.5, 5.0, 3)
                pb[i, 6] = rng.uniform(-np.pi, np.pi)
        pnames = rng.choice(classes, np_)
        pattrs = rng.choice(ATTRS[:-1], np_)
        preds.append({"boxes": pb, "labels_name": pnames,
                      "scores": rng.uniform(0.05, 1.0, np_)
                      .astype(np.float32), "attrs": pattrs})
    return gts, preds


@pytest.mark.parametrize("seed", range(8))
def test_nuscenes_eval_matches_devkit_rederivation(seed):
    rng = np.random.default_rng(seed)
    gts, preds = _random_frames(rng, n_frames=4, classes=CLASSES)
    want = _dk_eval(gts, preds, CLASSES)
    got = nuscenes_eval(gts, preds, CLASSES)
    for key in ("mAP", "NDS", "mATE", "mASE", "mAOE", "mAVE", "mAAE"):
        np.testing.assert_allclose(got[key], want[key], atol=1e-9,
                                   err_msg=f"seed {seed} {key}")


def test_nuscenes_eval_matches_devkit_duplicate_scores():
    """Tied confidences: ordering within a tie is implementation-defined
    in the devkit too, but the cumulative curves (and therefore AP/TP
    errors) must agree when the tied predictions are interchangeable."""
    rng = np.random.default_rng(99)
    gts, preds = _random_frames(rng, n_frames=3, classes=("car",))
    for p in preds:
        if len(p["scores"]):
            p["scores"] = np.round(p["scores"], 1)   # force ties
    want = _dk_eval(gts, preds, ("car",))
    got = nuscenes_eval(gts, preds, ("car",))
    np.testing.assert_allclose(got["mAP"], want["mAP"], atol=1e-7)
    np.testing.assert_allclose(got["NDS"], want["NDS"], atol=1e-7)
