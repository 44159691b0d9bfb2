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


def pair_matrix(tag: str, seeds):
    """Within- and cross-framework all-pairs ARI over non-collapsed runs.

    The reference's own seed-to-seed agreement is the ceiling any
    cross-framework comparison can be held to: basins pick different
    template groupings per seed, so ref-vs-ref disagrees with itself at
    exactly the rate ours-vs-ref does if the implementations are
    statistically equivalent.
    """
    runs = {}
    for side in ("ours", "ref"):
        for seed in seeds:
            o = load(tag, side, seed)
            if not o or not o.get("assignments"):
                continue
            if effective_clusters(o["clusters"]) < 2:
                continue
            runs[(side, seed)] = o["assignments"]
    names = sorted(runs)
    out = {"within_ref": [], "within_ours": [], "cross": []}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            keys = sorted(set(runs[a]) & set(runs[b]), key=int)
            v = adjusted_rand_index([runs[a][k] for k in keys],
                                    [runs[b][k] for k in keys])
            kind = ("within_%s" % a[0] if a[0] == b[0] else "cross")
            kind = kind.replace("within_ref", "within_ref").replace(
                "within_ours", "within_ours")
            out[kind if kind in out else "cross"].append(
                (a, b, round(v, 4)))
    for kind, pairs in out.items():
        vals = [v for _, _, v in pairs]
        if vals:
            print("%s: n=%d median %.4f  values %s" % (
                kind, len(vals), float(np.median(vals)),
                sorted(round(v, 3) for v in vals)))
    return out


def wilson_ci(k: int, n: int, z: float = 1.96):
    """Wilson score interval for a binomial proportion (robust at the
    small n of seed sweeps, unlike the normal approximation)."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z / denom) * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return (max(0.0, center - half), min(1.0, center + half))


def ignition_rates(tag: str, seeds):
    """Commit ('ignition') rate per framework with binomial CIs.

    A run commits when its final partition has >=2 effective clusters
    (see effective_clusters).  At n=9 per side the round-2 comparison
    (5/9 vs 3/9) could not separate the rates (overlapping CIs); this
    report exists to make the phase-boundary claim a measured statement
    at n~20 (VERDICT round-2 item 5).
    """
    out = {}
    for side in ("ours", "ref"):
        n = k = 0
        detail = []
        for seed in seeds:
            o = load(tag, side, seed)
            if not o or not o.get("clusters"):
                continue
            n += 1
            lit = effective_clusters(o["clusters"]) >= 2
            k += int(lit)
            detail.append((seed, int(lit)))
        lo, hi = wilson_ci(k, n)
        out[side] = {"commits": k, "runs": n, "rate": round(k / n, 3)
                     if n else None, "ci95": [round(lo, 3), round(hi, 3)],
                     "detail": detail}
        print("%s %s: %d/%d commit (rate %.2f, 95%% CI [%.2f, %.2f])"
              % (tag, side, k, n, k / n if n else float("nan"), lo, hi))
    if all(s in out for s in ("ours", "ref")):
        o, r = out["ours"], out["ref"]
        overlap = not (o["ci95"][1] < r["ci95"][0]
                       or r["ci95"][1] < o["ci95"][0])
        print("# CIs %s -> %s" % (
            "overlap" if overlap else "are disjoint",
            "no detectable rate difference at this n" if overlap
            else "real ignition-rate gap"))
    return out


def main():
    if sys.argv[1] == "--rates":
        tag = sys.argv[2]
        seeds = [int(s) for s in sys.argv[3:]]
        if not seeds:
            import glob as _g
            seeds = sorted({int(p.rsplit("_s", 1)[1].split(".")[0])
                            for p in _g.glob(os.path.join(
                                REPO, "parity_runs",
                                "*_%s_s*.json" % tag))})
        ignition_rates(tag, seeds)
        return
    if sys.argv[1] == "--matrix":
        tag = sys.argv[2]
        seeds = [int(s) for s in sys.argv[3:]] or [9999, 1111, 2222, 7777,
                                                   12345, 4444, 5555,
                                                   6666, 8888]
        pair_matrix(tag, seeds)
        return
    tag = sys.argv[1]
    seeds = [int(s) for s in sys.argv[2:]] or [9999, 1111, 2222, 7777,
                                               12345, 4444, 5555, 6666,
                                               8888]
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
