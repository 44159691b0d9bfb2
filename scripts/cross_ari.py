"""Cross-framework assignment agreement between two parity_run JSONs.

parity_run.py computes ours-vs-reference ARI only when both legs run in
one invocation; publication-scale legs run separately (the reference
costs hours of CPU, ours minutes of TPU — see PARITY.md §5/§6), so this
tool compares any two result files after the fact:

  python scripts/cross_ari.py parity_runs/ours_demo2pub_base_s5.json \
      parity_runs/ref_demo2pub_s5.json

Prints ARI between the two assignment maps (intersection of segment
indices), each side's ARI vs ground truth when present, and the two
cluster histograms.  Reference anchor for what the assignments are:
argmax over the K-class posterior the encode path emits
(ABCD-VAE/encode.py:38-55, model.py:592-606).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from parity_run import adjusted_rand_index  # noqa: E402


def _leg(payload: dict) -> dict:
    for side in ("ours", "reference"):
        if payload.get(side) and payload[side].get("assignments"):
            return payload[side]
    raise SystemExit("no assignments in JSON (keys: %s)" % list(payload))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("json_a")
    ap.add_argument("json_b")
    args = ap.parse_args()
    a = json.load(open(args.json_a))
    b = json.load(open(args.json_b))
    la, lb = _leg(a), _leg(b)
    aa, ab = la["assignments"], lb["assignments"]
    keys = sorted(set(aa) & set(ab), key=lambda k: int(k))
    if not keys:
        raise SystemExit("assignment key sets are disjoint")
    ari = adjusted_rand_index([aa[k] for k in keys], [ab[k] for k in keys])
    out = {
        "n_common": len(keys),
        "cross_ari": round(float(ari), 4),
        "a": {"file": args.json_a, "ari_vs_truth": la.get("ari_vs_truth"),
              "clusters": len(la.get("clusters", {}) or
                             set(aa.values()))},
        "b": {"file": args.json_b, "ari_vs_truth": lb.get("ari_vs_truth"),
              "clusters": len(lb.get("clusters", {}) or
                             set(ab.values()))},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
