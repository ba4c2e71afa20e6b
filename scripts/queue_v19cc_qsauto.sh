#!/bin/bash
# Round-5c pre-registered one-shot: confidence-gated qscore rerank
# (FINAL.md round-5c block — committed BEFORE any of these runs).
# Scores the gated rerank on the v19c ensembles (the only live 3-seed
# ensembles; the FINAL checkpoints were cleaned from disk between
# rounds), against the round-5b rows as comparators. Each row scored
# ONCE, reported unedited.
set -x
cd /root/repo
CK=.ckpts
ENSB=$CK/v19c_B_s100/best_model,$CK/v19c_B_s101/best_model,$CK/v19c_B_s102/best_model
ENSA=$CK/v19c_A_s100/best_model,$CK/v19c_A_s101/best_model,$CK/v19c_A_s102/best_model
RANK="--threshold 0 --nms 0.1 --extent 1.0 --fuse --tta"
DET="--threshold 0.05 --nms 0.1 --top_k 12 --extent 1.0 --fuse --tta"
YV="--ycal /root/reference/dataset/val/colliders.json"
YT="--ycal /root/reference/dataset/train/colliders.json"
QS="--qscore results/r5_qscore_multi.json"

tau () {  # ensemble seen_dir -> half the min per-capture max-confidence
python3 - "$1" "$2" <<'EOF'
import sys
import numpy as np
from room_slam_tpu.tools.realbench import capture_confidence, forward_captures
cached = forward_captures(sys.argv[1], [sys.argv[2]], tta=True)
print(round(float(capture_confidence(cached).min()) / 2.0, 4))
EOF
}

run () { out=$1; shift; [ -f "$out" ] || python3 -m room_slam_tpu.tools.realbench "$@" --output "$out" > /tmp/$(basename $out .json).log 2>&1; echo "=== $out rc=$?"; }

TAUB=$(tau "$ENSB" /root/reference/dataset/val)
TAUA=$(tau "$ENSA" /root/reference/dataset/train)
echo "TAUB=$TAUB TAUA=$TAUA"

run results/r5c_B_qsauto_ranking_ens.json   --checkpoint $ENSB $RANK $YV $QS --qscore_auto $TAUB
run results/r5c_B_qsauto_detection_ens.json --checkpoint $ENSB $DET  $YV $QS --qscore_auto $TAUB
run results/r5c_A_qsauto_ranking_ens.json   --checkpoint $ENSA $RANK $YT $QS --qscore_auto $TAUA
# informative composed row (full unseen-room recipe, not a decision input)
run results/r5c_B_qsauto_ttopt_ranking_ens.json --checkpoint $ENSB $RANK $YV $QS --qscore_auto $TAUB --ttopt --ttopt_params "{\"auto\": $TAUB}"
echo V19CC_QSAUTO_DONE
