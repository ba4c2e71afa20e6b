#!/usr/bin/env python3
"""Print the v19c one-shot readings (FINAL.md round-5b rows) unedited.

For direction-B ensembles (trained on val) zero-shot = per_dir/train
(77 GT) and seen = per_dir/val; direction A is the reverse. Emits the
exact numbers the round-5b decision rule consumes, plus the diagnosis
row's ceiling/no-candidate counts when present.
"""
import json
import os

R = "results"


def row(path, zs_dir, seen_dir):
    d = json.load(open(path))
    zs, seen = d["per_dir"][zs_dir], d["per_dir"][seen_dir]
    return {
        "file": os.path.basename(path),
        "zs_mAP@0.25": round(zs["mAP@0.25"], 4),
        "zs_tp@0.25": zs["tp@0.25"],
        "zs_detF1@0.25": round(zs["det_f1@0.25"], 3),
        "zs_mAP@0.5": round(zs["mAP@0.5"], 4),
        "zs_tp@0.5": zs["tp@0.5"],
        "seen_mAP@0.25": round(seen["mAP@0.25"], 4),
    }


def main():
    rows = [
        ("r5_v19c_B_ranking_ens.json", "train", "val"),
        ("r5_v19c_B_soft_ens.json", "train", "val"),
        ("r5_v19c_B_detection_ens.json", "train", "val"),
        ("r5_v19c_A_ranking_ens.json", "val", "train"),
        ("r5_v19c_B_ttoptauto_ranking_ens.json", "train", "val"),
    ]
    for name, zs, seen in rows:
        p = os.path.join(R, name)
        if not os.path.exists(p):
            print(f"{name}: MISSING")
            continue
        print(json.dumps(row(p, zs, seen)))
    dg = os.path.join(R, "r5_v19c_B_zeroshot_diagnosis_ens.json")
    if os.path.exists(dg):
        agg = json.load(open(dg))["aggregate"]
        print(json.dumps({"file": os.path.basename(dg),
                          "all": agg["all"], "furniture": agg["furniture"],
                          "walls": agg["walls"]}))
    else:
        print("diagnosis: MISSING")

    # decision rule, applied mechanically (round-5b block):
    try:
        r1 = row(os.path.join(R, "r5_v19c_B_ranking_ens.json"), "train", "val")
        r2 = row(os.path.join(R, "r5_v19c_B_soft_ens.json"), "train", "val")
        r3 = row(os.path.join(R, "r5_v19c_B_detection_ens.json"), "train", "val")
        r4 = row(os.path.join(R, "r5_v19c_A_ranking_ens.json"), "val", "train")
        wins = [r1["zs_tp@0.25"] > 24, r2["zs_tp@0.25"] > 33,
                r3["zs_tp@0.25"] > 17]
        seen_ok = (r1["seen_mAP@0.25"] >= 0.99 and r2["seen_mAP@0.25"] >= 0.99
                   and r3["seen_mAP@0.25"] >= 0.99
                   and r4["seen_mAP@0.25"] >= 0.93)
        print(json.dumps({"rule_tp_wins": wins, "rule_seen_ok": seen_ok,
                          "ADOPT": sum(wins) >= 2 and seen_ok}))
    except FileNotFoundError:
        print("rule: rows incomplete")


if __name__ == "__main__":
    main()
