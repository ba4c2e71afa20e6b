"""FINAL-B baseline probes on ms2_calib from the saved ensemble forward
cache: per-seed + ensemble pre-NMS candidate ceilings and ranking/soft
cells. The cache's pooled query axis is [s100 | s101 | s102] blocks (each
with its 4 TTA views), so per-seed rows are slices — no new forwards."""
import json, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from room_slam_tpu.tools.calibrate import sweep
from room_slam_tpu.ops.iou import iou_giou_3d

z = np.load("/tmp/cal_ms2_cache.npz", allow_pickle=True)
cached = {k: (z[k] if z[k].dtype != object else z[k].tolist())
          for k in z.files}
Qp = cached["pred_boxes"].shape[1]
assert Qp % 3 == 0
Qs = Qp // 3

@jax.jit
def best_iou(pred, gt):
    iou, _ = iou_giou_3d(pred[:, None, :], gt[None, :, :])
    return jnp.max(iou, axis=0)

def ceiling(pred_boxes):
    N = pred_boxes.shape[0]
    hits = {}; tot = {}; h25 = t = 0
    for i in range(N):
        v = cached["gt_valid"][i]
        if not v.any():
            continue
        gt = cached["gt_boxes"][i][v]; gl = cached["gt_labels"][i][v]
        bi = np.asarray(best_iou(jnp.asarray(pred_boxes[i]), jnp.asarray(gt)))
        for c in np.unique(gl):
            m = gl == c
            hits[int(c)] = hits.get(int(c), 0) + int((bi[m] >= 0.25).sum())
            tot[int(c)] = tot.get(int(c), 0) + int(m.sum())
        h25 += int((bi >= 0.25).sum()); t += int(v.sum())
    return {"hits@0.25": h25, "gt": t,
            "per_class": {str(c): [hits[c], tot[c]] for c in sorted(tot)}}

def cells(sub):
    out = {}
    for name, kw in [
            ("ranking", dict(thresholds=(0.0,), nms_vals=(0.1,),
                             refine_vals=(None,), extent_vals=(1.0,),
                             fuse_vals=(True,))),
            ("soft", dict(thresholds=(0.0,), nms_vals=(0.5,),
                          refine_vals=(None,), extent_vals=(1.0,),
                          fuse_vals=(True,), soft_vals=(0.25,)))]:
        c = sweep(sub, iou_thresholds=(0.5, 0.25), **kw)[0]
        out[name] = {k: c[k] for k in (
            "mAP@0.5", "det_f1@0.5", "tp@0.5",
            "mAP@0.25", "det_f1@0.25", "tp@0.25", "AP_per_class@0.25")}
    return out

res = {}
for tag, sl in [("s100", slice(0, Qs)), ("s101", slice(Qs, 2 * Qs)),
                ("s102", slice(2 * Qs, None)), ("ens", slice(None))]:
    sub = dict(cached)
    sub["pred_boxes"] = cached["pred_boxes"][:, sl]
    sub["pred_logits"] = cached["pred_logits"][:, sl]
    if "pred_objectness" in cached:
        sub["pred_objectness"] = cached["pred_objectness"][:, sl]
    t0 = time.time()
    res[tag] = {"ceiling": ceiling(sub["pred_boxes"]), "cells": cells(sub)}
    r = res[tag]
    print(f"{tag}: ceil {r['ceiling']['hits@0.25']}/{r['ceiling']['gt']} "
          f"{r['ceiling']['per_class']} | rank tp@.25 "
          f"{r['cells']['ranking']['tp@0.25']} tp@.5 "
          f"{r['cells']['ranking']['tp@0.5']} | soft tp@.25 "
          f"{r['cells']['soft']['tp@0.25']}  ({time.time()-t0:.0f}s)",
          flush=True)

json.dump(res, open("/tmp/probe_finalB_ms2.json", "w"), indent=1)
print("wrote /tmp/probe_finalB_ms2.json")
