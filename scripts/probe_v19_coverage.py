"""v19 coverage-loss probe: score checkpoint(s) on a synthetic split at the
ranking + soft cells AND measure the pre-NMS pooled-candidate ceiling
(per-GT max IoU over ALL candidates) — the quantity the coverage loss is
supposed to raise. Usage:
    probe_v19.py <ckpt[,ckpt...]> <split_dir> <out.json> [tag]
CPU only."""
import json, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from room_slam_tpu.tools.calibrate import _forward_val_set, sweep
from room_slam_tpu.ops.iou import iou_giou_3d

ckpts, split, out = sys.argv[1], sys.argv[2], sys.argv[3]
tag = sys.argv[4] if len(sys.argv) > 4 else ""
cache = sys.argv[5] if len(sys.argv) > 5 else None

import os
if cache and os.path.exists(cache):
    z = np.load(cache, allow_pickle=True)
    cached = {k: (z[k] if z[k].dtype != object else z[k].tolist())
              for k in z.files}
    print("loaded forward cache", cache, flush=True)
else:
    t0 = time.time()
    cached = _forward_val_set(ckpts, split, batch_size=8, tta=True)
    if cache:
        np.savez(cache, **{k: (np.asarray(v, dtype=object)
                               if k == "names" else v)
                           for k, v in cached.items()})
    print(f"forward cached in {time.time()-t0:.0f}s "
          f"{cached['pred_boxes'].shape}", flush=True)

# --- pre-NMS pooled-candidate ceiling: per-GT best IoU over all candidates
@jax.jit
def best_iou(pred, gt):                      # [Q,6], [M,6] -> [M]
    iou, _ = iou_giou_3d(pred[:, None, :], gt[None, :, :])
    return jnp.max(iou, axis=0)

N = cached["pred_boxes"].shape[0]
per_class_hits = {}
per_class_tot = {}
hits25 = tot = 0
for i in range(N):
    v = cached["gt_valid"][i]
    if not v.any():
        continue
    gt = cached["gt_boxes"][i][v]
    gl = cached["gt_labels"][i][v]
    bi = np.asarray(best_iou(jnp.asarray(cached["pred_boxes"][i]),
                             jnp.asarray(gt)))
    for c in np.unique(gl):
        m = gl == c
        per_class_hits[int(c)] = per_class_hits.get(int(c), 0) + int(
            (bi[m] >= 0.25).sum())
        per_class_tot[int(c)] = per_class_tot.get(int(c), 0) + int(m.sum())
    hits25 += int((bi >= 0.25).sum()); tot += int(v.sum())
ceiling = {"hits@0.25": hits25, "gt": tot,
           "per_class": {str(c): [per_class_hits[c], per_class_tot[c]]
                         for c in sorted(per_class_tot)}}
print(f"pre-NMS ceiling: {hits25}/{tot} "
      f"{ceiling['per_class']}", flush=True)

# --- scored cells
cells = {}
for name, kw in [
        ("ranking", dict(thresholds=(0.0,), nms_vals=(0.1,),
                         refine_vals=(None,), extent_vals=(1.0,),
                         fuse_vals=(True,))),
        ("soft", dict(thresholds=(0.0,), nms_vals=(0.5,),
                      refine_vals=(None,), extent_vals=(1.0,),
                      fuse_vals=(True,), soft_vals=(0.25,)))]:
    c = sweep(cached, iou_thresholds=(0.5, 0.25), **kw)[0]
    cells[name] = {k: c[k] for k in (
        "mAP@0.5", "det_f1@0.5", "tp@0.5",
        "mAP@0.25", "det_f1@0.25", "tp@0.25", "AP_per_class@0.25")}
    print(f"{name}: mAP@.25 {c['mAP@0.25']:.4f} tp@.25 {c['tp@0.25']} "
          f"| tp@.5 {c['tp@0.5']}", flush=True)

json.dump({"tag": tag, "checkpoints": ckpts, "split": split,
           "ceiling": ceiling, "cells": cells},
          open(out, "w"), indent=1)
print("wrote", out)
