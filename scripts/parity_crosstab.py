"""Cross-framework assignment analysis over saved parity records.

Reads parity_runs/{ours,ref}_<tag>_s<seed>.json pairs (written by
parity_run.py with per-side ``assignments``), and reports per seed:

- cluster count and sizes on each side (collapse = 1 effective cluster);
- ARI vs the 2-class phonetic truth (labels A/C);
- ARI vs TEMPLATE identity (toyaug renders row i from template i % 6 —
  the finest structure the corpus actually contains);
- cross-framework ARI(ref, ours) — the judge-facing parity metric,
  label-permutation-invariant.

Usage: python scripts/parity_crosstab.py <tag> [seeds...]
e.g.   python scripts/parity_crosstab.py dose1a 9999 1111 2222
"""

import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from parity_run import adjusted_rand_index  # noqa: E402


def effective_clusters(hist: dict, min_frac: float = 0.01, n: int = 300):
    """Clusters holding at least min_frac of the rows (strays of a few
    segments do not make a run 'non-collapsed')."""
    return sum(1 for v in hist.values() if v >= min_frac * n)


def load(tag: str, side: str, seed: int):
    path = os.path.join(REPO, "parity_runs",
                        "%s_%s_s%d.json" % (side, tag, seed))
    if not os.path.isfile(path):
        return None
    d = json.load(open(path))
    key = "ours" if side == "ours" else "reference"
    return d.get(key)


def main():
    tag = sys.argv[1]
    seeds = [int(s) for s in sys.argv[2:]] or [9999, 1111, 2222, 7777,
                                               12345]
    rows = []
    for seed in seeds:
        ours = load(tag, "ours", seed)
        ref = load(tag, "ref", seed)
        if not ours or not ref:
            print("# seed %d: missing %s" % (
                seed, "ours" if not ours else "ref"))
            continue
        oa, ra = ours.get("assignments"), ref.get("assignments")
        if not oa or not ra:
            print("# seed %d: no assignments persisted" % seed)
            continue
        keys = sorted(set(oa) & set(ra), key=int)
        o = [oa[k] for k in keys]
        r = [ra[k] for k in keys]
        template = [int(k) % 6 for k in keys]
        labels = ["AACCCA"[int(k) % 6] for k in keys]  # template -> label
        n = len(keys)
        row = {
            "seed": seed,
            "clusters_ours": effective_clusters(ours["clusters"], n=n),
            "clusters_ref": effective_clusters(ref["clusters"], n=n),
            "sizes_ours": dict(sorted(ours["clusters"].items(),
                                      key=lambda kv: -kv[1])),
            "sizes_ref": dict(sorted(ref["clusters"].items(),
                                     key=lambda kv: -kv[1])),
            "ari_label_ours": round(adjusted_rand_index(labels, o), 4),
            "ari_label_ref": round(adjusted_rand_index(labels, r), 4),
            "ari_template_ours": round(adjusted_rand_index(template, o), 4),
            "ari_template_ref": round(adjusted_rand_index(template, r), 4),
            "cross_ari": round(adjusted_rand_index(r, o), 4),
            "pperp_ours": round(ours["curves"]["posterior_perplexity"][-1],
                                3),
            "pperp_ref": round(ref["curves"]["posterior_perplexity"][-1],
                               3),
        }
        rows.append(row)
        print(json.dumps(row))
    both = [r for r in rows
            if r["clusters_ours"] > 1 and r["clusters_ref"] > 1]
    if both:
        med = float(np.median([r["cross_ari"] for r in both]))
        print("# non-collapsed pairs: %d/%d, median cross-ARI %.4f"
              % (len(both), len(rows), med))


if __name__ == "__main__":
    main()
