"""Host-side padded-frame-waste comparison of bucket-edge schemes.

Round-4 VERDICT item 3: the bench corpus wastes ~15% of device frames
on padding under the quantile-6 edges.  This probe computes, purely on
the host (no TPU), the epoch frame-waste of quantile vs DP-optimal
edges at several bucket budgets, on the exact bench corpus and loader
composition (bucket_shuffled, batch 512).  Decides the shipping
default; the throughput A/B runs separately on hardware (bench.py).

Usage: python scripts/bucket_edge_probe.py [--segments 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=4096)
    ap.add_argument("--batch_size", type=int, default=512)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from bench import make_workload
    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import (
        DataLoader, FrontendSpec, chunk_optimal_bucket_edges,
        optimal_bucket_edges, quantile_bucket_edges)

    work = tempfile.mkdtemp(prefix="bucketprobe-")
    wav_root, ann = make_workload(args.segments, work)
    parser = AnnotationParser(wav_root, ann)
    fs = parser.get_sample_freq()
    fe = FrontendSpec(int(np.floor(0.008 * fs)), int(np.floor(0.004 * fs)))
    train = parser.get_data("train")

    rows = []
    for policy, fn in (("quantile", quantile_bucket_edges),
                       ("dp", optimal_bucket_edges)):
        for nb in (4, 6, 8, 10, 12):
            for mult in (8, 16):
                os.environ["SEQ2SEQ_BUCKET_POLICY"] = policy
                os.environ["SEQ2SEQ_NUM_BUCKETS"] = str(nb)
                loader = DataLoader(train, fe, batch_size=args.batch_size,
                                    shuffle=True,
                                    batching_mode="bucket_shuffled",
                                    pad_to_batch_size=False,
                                    skip_audio=True)
                loader.bucket_edges = fn(
                    loader._frames_for_lengths(train.lengths_np),
                    num_buckets=nb, multiple=mult)
                st = loader.epoch_padding_stats()
                rows.append({"policy": policy, "num_buckets": nb,
                             "multiple": mult,
                             "edges": loader.bucket_edges,
                             "n_edges": len(loader.bucket_edges),
                             "waste": round(st["frame_waste_frac"], 4)})
                print(json.dumps(rows[-1]))
    # composition-matched edges (shipping default): band-max order
    # statistics, unrounded; budget sweep exercises the DP-merge path
    for nb in (4, 8, 16):
        os.environ["SEQ2SEQ_BUCKET_POLICY"] = "chunk"
        loader = DataLoader(train, fe, batch_size=args.batch_size,
                            shuffle=True,
                            batching_mode="bucket_shuffled",
                            pad_to_batch_size=False, skip_audio=True)
        loader.bucket_edges = chunk_optimal_bucket_edges(
            loader._frames_for_lengths(train.lengths_np),
            batch_size=args.batch_size, num_buckets=nb)
        st = loader.epoch_padding_stats()
        rows.append({"policy": "chunk", "num_buckets": nb,
                     "multiple": 1, "edges": loader.bucket_edges,
                     "n_edges": len(loader.bucket_edges),
                     "waste": round(st["frame_waste_frac"], 4)})
        print(json.dumps(rows[-1]))
    # analytic floor for the sorted-chunk composition (no edge scheme
    # can beat this without multi-segment packing)
    frames = loader._frames_for_lengths(train.lengths_np)
    frames = np.sort(frames[frames > 0])
    B, tot = args.batch_size, frames.sum()
    padded = sum(int(frames[min(i + B, len(frames)) - 1])
                 * min(B, len(frames) - i)
                 for i in range(0, len(frames), B))
    print(json.dumps({"policy": "floor(sorted-chunk)",
                      "waste": round(1.0 - tot / padded, 4)}))
    best = min(rows, key=lambda r: (r["waste"], r["n_edges"]))
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
