"""Aggregate parity_runs/*.json records into markdown tables for
PARITY.md.

Usage: python scripts/parity_summary.py [--glob 'synth_seed*.json']
Prints a per-seed table plus summary statistics (median cross-framework
ARI on non-collapsed pairs — the VERDICT round-1 acceptance metric).
"""

import argparse
import glob
import json
import os

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def load(pattern):
    records = []
    for path in sorted(glob.glob(os.path.join(REPO, "parity_runs",
                                              pattern))):
        with open(path) as f:
            d = json.load(f)
        d["_path"] = os.path.basename(path)
        records.append(d)
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="synth_seed*.json")
    args = ap.parse_args()
    records = load(args.glob)
    if not records:
        print("no records match", args.glob)
        return

    rows = []
    for d in records:
        cfg = d["config"]
        ref = d.get("reference", {})
        ours = d.get("ours", {})
        comp = d.get("comparison", {})
        ref_hist = comp.get("cluster_histogram", {}).get("ref", {})
        ours_hist = comp.get("cluster_histogram", {}).get("ours", {})
        rows.append({
            "seed": cfg["seed"],
            "classes": cfg.get("classes"),
            "ref_k": len(ref_hist),
            "ours_k": len(ours_hist),
            "ref_ari_truth": ref.get("ari_vs_truth"),
            "ours_ari_truth": ours.get("ari_vs_truth"),
            "cross_ari": comp.get("assignment_ari_ref_vs_ours"),
            "ref_final": comp.get("final_train_total", {}).get("ref"),
            "ours_final": comp.get("final_train_total", {}).get("ours"),
        })

    fmt = lambda v, p=2: "—" if v is None else f"{v:.{p}f}"
    print("| seed | ref clusters | ours clusters | ARI(ref,truth) | "
          "ARI(ours,truth) | ARI(ref,ours) | ref final | ours final |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['seed']} | {r['ref_k']} | {r['ours_k']} | "
              f"{fmt(r['ref_ari_truth'])} | {fmt(r['ours_ari_truth'])} | "
              f"{fmt(r['cross_ari'])} | {fmt(r['ref_final'], 0)} | "
              f"{fmt(r['ours_final'], 0)} |")

    # Non-collapsed pairs = both frameworks used >1 cluster.
    ok = [r for r in rows if r["ref_k"] > 1 and r["ours_k"] > 1
          and r["cross_ari"] is not None]
    cross = np.array([r["cross_ari"] for r in ok], float)
    print()
    print(f"seeds: {len(rows)}; non-collapsed pairs: {len(ok)}")
    if len(ok):
        print(f"cross-framework ARI on non-collapsed pairs: "
              f"median {np.median(cross):.3f}, "
              f"min {cross.min():.3f}, max {cross.max():.3f}")
    truth_ref = [r["ref_ari_truth"] for r in rows
                 if r["ref_ari_truth"] is not None]
    truth_ours = [r["ours_ari_truth"] for r in rows
                  if r["ours_ari_truth"] is not None]
    if truth_ref and truth_ours:
        print(f"ARI vs ground truth: reference median "
              f"{np.median(truth_ref):.3f}, ours median "
              f"{np.median(truth_ours):.3f}")
    finals_ref = [r["ref_final"] for r in rows if r["ref_final"]]
    finals_ours = [r["ours_final"] for r in rows if r["ours_final"]]
    if finals_ref and finals_ours:
        print(f"final train totals: reference median "
              f"{np.median(finals_ref):.0f}, ours median "
              f"{np.median(finals_ours):.0f}")


if __name__ == "__main__":
    main()
