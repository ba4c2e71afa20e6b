#!/usr/bin/env python3
"""Print the round-5c gated-qscore one-shot readings unedited.

Comparators are the round-5b rows (same ensembles, same cells, no
qscore): r5_v19c_B_ranking_ens / r5_v19c_B_detection_ens /
r5_v19c_A_ranking_ens. Applies the round-5c decision rule mechanically.
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
        "seen_mAP@0.25": round(seen["mAP@0.25"], 4),
    }


def main():
    pairs = [
        ("r5c_B_qsauto_ranking_ens.json", "r5_v19c_B_ranking_ens.json",
         "train", "val"),
        ("r5c_B_qsauto_detection_ens.json", "r5_v19c_B_detection_ens.json",
         "train", "val"),
        ("r5c_A_qsauto_ranking_ens.json", "r5_v19c_A_ranking_ens.json",
         "val", "train"),
        ("r5c_B_qsauto_ttopt_ranking_ens.json",
         "r5_v19c_B_ttoptauto_ranking_ens.json", "train", "val"),
    ]
    rows = {}
    for name, base, zs, seen in pairs:
        p = os.path.join(R, name)
        if not os.path.exists(p):
            print(f"{name}: MISSING")
            continue
        r, b = row(p, zs, seen), row(os.path.join(R, base), zs, seen)
        rows[name] = (r, b)
        print(json.dumps({"row": r, "comparator": b}))

    try:
        r1, b1 = rows["r5c_B_qsauto_ranking_ens.json"]
        r2, b2 = rows["r5c_B_qsauto_detection_ens.json"]
        r3, b3 = rows["r5c_A_qsauto_ranking_ens.json"]
        gain = (r1["zs_mAP@0.25"] > b1["zs_mAP@0.25"]
                or r2["zs_detF1@0.25"] > b2["zs_detF1@0.25"])
        seen_ok = (abs(r1["seen_mAP@0.25"] - b1["seen_mAP@0.25"]) <= 0.001
                   and abs(r2["seen_mAP@0.25"] - b2["seen_mAP@0.25"]) <= 0.001
                   and abs(r3["seen_mAP@0.25"] - b3["seen_mAP@0.25"]) <= 0.001)
        print(json.dumps({"rule_gain": gain, "rule_seen_identical": seen_ok,
                          "ADOPT": gain and seen_ok}))
    except KeyError:
        print("rule: rows incomplete")


if __name__ == "__main__":
    main()
