#!/bin/bash
# v19c coverage-loss pre-registered one-shot (FINAL.md round-5b block —
# committed BEFORE any of these runs). Trains the 2x3 seed ensembles with
# the FINAL recipe + the two coverage flags, then scores each row ONCE.
set -x
cd /root/repo
CK=.ckpts
COV="--set train.coverage_weight=2.0 --set train.coverage_furniture_only=true"

train_one () {  # dir seed mix_dir mix_copies
  local D=$CK/v19c_${1}_s$2
  [ -f $D/best_model.msgpack ] && return 0
  python3 train.py --config configs/flagship_v15.json \
    --synthetic 2048 --synthetic_mode mixed \
    --mix_real /root/reference/dataset/$3 --mix_copies $4 \
    --seed $2 $COV --save_dir $D > /tmp/v19c_${1}_s$2.log 2>&1
  echo "=== v19c_${1}_s$2 rc=$?"
}

for S in 100 101 102; do train_one B $S val 112; done
for S in 100 101 102; do train_one A $S train 16; done
echo V19C_TRAINS_DONE

ENSB=$CK/v19c_B_s100/best_model,$CK/v19c_B_s101/best_model,$CK/v19c_B_s102/best_model
ENSA=$CK/v19c_A_s100/best_model,$CK/v19c_A_s101/best_model,$CK/v19c_A_s102/best_model
RANK="--threshold 0 --nms 0.1 --extent 1.0 --fuse --tta"
SOFT="--threshold 0 --nms 0.5 --soft 0.25 --extent 1.0 --fuse --tta"
DET="--threshold 0.05 --nms 0.1 --top_k 12 --extent 1.0 --fuse --tta"
YV="--ycal /root/reference/dataset/val/colliders.json"
YT="--ycal /root/reference/dataset/train/colliders.json"

run () { out=$1; shift; [ -f "$out" ] || python3 -m room_slam_tpu.tools.realbench "$@" --output "$out" > /tmp/$(basename $out .json).log 2>&1; echo "=== $out rc=$?"; }

# tau for the adopted ttopt auto-gate, recomputed from the NEW B ensemble's
# seen (val) capture per the standing rule: half its min max-confidence.
run results/r5_v19c_B_ranking_ens.json   --checkpoint $ENSB $RANK $YV
run results/r5_v19c_B_soft_ens.json      --checkpoint $ENSB $SOFT $YV
run results/r5_v19c_B_detection_ens.json --checkpoint $ENSB $DET  $YV
run results/r5_v19c_A_ranking_ens.json   --checkpoint $ENSA $RANK $YT
TAU=$(python3 - "$ENSB" <<'EOF'
# standing auto-gate rule: tau = half the seen room's minimum capture
# max-confidence (B seen = the val capture), computed from the NEW
# ensemble's own raw pooled outputs — no unseen-room data.
import sys
import numpy as np
from room_slam_tpu.tools.realbench import forward_captures
cached = forward_captures(sys.argv[1], ["/root/reference/dataset/val"],
                          tta=True)
probs = np.exp(cached["pred_logits"]
               - cached["pred_logits"].max(-1, keepdims=True))
probs /= probs.sum(-1, keepdims=True)
conf = probs.max(-1)
if cached.get("pred_objectness") is not None:
    conf = conf / (1.0 + np.exp(-np.asarray(cached["pred_objectness"])))
sig = conf.max(-1)
print(round(float(sig.min()) / 2.0, 4))
EOF
)
echo "TAU_B=$TAU"
run results/r5_v19c_B_ttoptauto_ranking_ens.json --checkpoint $ENSB $RANK $YV --ttopt --ttopt_params "{\"auto\": $TAU}"
# diagnostic row (not a decision input): per-GT ceiling on the real 77 GT
[ -f results/r5_v19c_B_zeroshot_diagnosis_ens.json ] || \
python3 -m room_slam_tpu.tools.diagnose_zeroshot --checkpoint $ENSB \
  --zero_shot_dir /root/reference/dataset/train \
  --threshold 0 --nms 0.1 --extent 1.0 --fuse --tta \
  --output results/r5_v19c_B_zeroshot_diagnosis_ens.json \
  > /tmp/r5_v19c_diag.log 2>&1
echo "=== diagnosis rc=$?"
echo V19C_ONESHOT_DONE
