"""End-to-end scientific demo: unsupervised discovery of acoustic
categories on a synthetic corpus, on-device.

Generates a wav corpus with two acoustically distinct syllable types
(rising chirps vs band-limited noise bursts), trains the ABCD-VAE through
the real CLI, encodes class probabilities, and scores the discovered
clusters against the ground-truth types (adjusted Rand index).  This is
the capability the reference was built for (birdsong syllable
clustering), demonstrated at a scale the reference's CPU loop cannot
reach interactively.

Usage: python scripts/demo_synthetic.py [--segments 800] [--epochs 10]
       [--device tpu]
--corpus rich uses the multi-archetype generator (scripts/synth_corpus.py,
--classes syllable types); --publication applies the Morita-et-al. 2021
config from the reference README (K=128, f=256, hidden 256,
speaker_embed 256, batch 512; README.md:63-78).
Writes DEMO.json at the repo root.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import scipy.io.wavfile as spw

from parity_run import adjusted_rand_index

FS = 16000


def synth_corpus(num_segments: int, out_dir: str, seed: int = 0,
                 dur_range=(0.15, 0.35)):
    rng = np.random.default_rng(seed)
    rows = []
    cursor = 0.05
    samples = []
    for i in range(num_segments):
        dur = float(rng.uniform(*dur_range))
        n = int(dur * FS)
        t = np.arange(n) / FS
        kind = i % 2
        if kind == 0:  # rising chirp 1->3 kHz
            f0, f1 = 1000.0, 3000.0
            phase = 2 * np.pi * (f0 * t + (f1 - f0) * t * t / (2 * dur))
            seg = np.sin(phase) * 6000
        else:  # noise burst band-passed around 6 kHz
            noise = rng.normal(size=n)
            carrier = np.sin(2 * np.pi * 6000.0 * t)
            seg = noise * carrier * 5000
        env = np.minimum(1.0, np.minimum(t / 0.02, (dur - t) / 0.02))
        seg = seg * np.maximum(env, 0.0) + rng.normal(size=n) * 100
        samples.append(seg.astype(np.int16))
        rows.append((round(cursor, 4), round(cursor + dur, 4),
                     "syllables.wav",
                     "valid" if i % 10 == 9 else "train",
                     "s%d" % (i % 2), "chirp" if kind == 0 else "noise"))
        cursor += dur + 0.02
    wav = np.zeros(int(cursor * FS) + FS, np.int16)
    for (onset, offset, _, _, _, _), seg in zip(rows, samples):
        wav[int(round(onset * FS)):int(round(onset * FS)) + len(seg)] = seg
    spw.write(os.path.join(out_dir, "syllables.wav"), FS, wav)
    df = pd.DataFrame(rows, columns=["onset", "offset", "input_path",
                                     "data_type", "speaker", "label"])
    ann = os.path.join(out_dir, "annotation.csv")
    df.to_csv(ann, index=False)
    return ann, df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=800)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--pretrain_epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("-K", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--device", type=str, default="tpu")
    ap.add_argument("--bidirectional_decoder", action="store_true",
                    help="the reference's anti-posterior-collapse option")
    ap.add_argument("--learning_rate", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--prior_concentration", type=float, default=1.0)
    ap.add_argument("--corpus", choices=("twoclass", "rich"),
                    default="twoclass",
                    help="'rich' = multi-archetype corpus "
                         "(scripts/synth_corpus.py) with --classes types")
    ap.add_argument("--classes", type=int, default=12)
    ap.add_argument("--corpus_seed", type=int, default=0)
    ap.add_argument("--greedy_decoder", action="store_true",
                    help="no decoder self-feedback — the reference's "
                         "working anti-collapse option (learning.py:380)")
    ap.add_argument("--publication", action="store_true",
                    help="Morita et al. 2021 config (reference "
                         "README.md:63-78): K=128 f=256 hidden=256 "
                         "speaker_embed=256 batch=512 epochs=20 pretrain=5")
    args = ap.parse_args()
    if args.publication:
        args.K, args.hidden, args.batch_size = 128, 256, 512
        args.epochs = max(args.epochs, 20)
        args.pretrain_epochs = max(args.pretrain_epochs, 5)

    work = tempfile.mkdtemp(prefix="demo-")
    if args.corpus == "rich":
        from synth_corpus import synth_corpus as rich_corpus
        ann, df = rich_corpus(work, args.segments,
                              num_classes=args.classes,
                              seed=args.corpus_seed,
                              dur_range=(0.10, 0.30), valid_every=10)
    else:
        ann, df = synth_corpus(args.segments, work)

    from seq2seq_abcd_vae_tpu.cli.encode_main import main as encode_main
    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main

    feat_dim = "256" if args.publication else "32"
    spk_dim = "256" if args.publication else "16"
    argv = [
        work, ann, "-S", work, "-j", "demo", "-e", str(args.epochs),
        "--pretrain_epochs", str(args.pretrain_epochs), "-b",
        str(args.batch_size), "-K", str(args.K), "-f", feat_dim,
        "--encoder_rnn_hidden_size", str(args.hidden),
        "--decoder_rnn_hidden_size", str(args.hidden),
        "--mlp_hidden_size", str(args.hidden), "-N", "11.0",
        "-l", str(args.learning_rate), "-s", str(args.seed),
        "--prior_concentration", str(args.prior_concentration),
        "--speaker_embed_dim", spk_dim, "-d", args.device,
        "--matmul_precision", "default", "--length_sorted_batches"]
    if args.bidirectional_decoder:
        argv.append("--bidirectional_decoder")
    if args.greedy_decoder:
        argv.append("--greedy_decoder")
    t0 = time.time()
    learn_main("abcd", argv)
    train_wall = time.time() - t0

    probs_csv = os.path.join(work, "probs.csv")
    encode_main("probs", [
        os.path.join(work, "demo", "checkpoint.pt"), work, ann, "11.0",
        "-S", probs_csv, "-b", str(args.batch_size), "-d", args.device,
        "--matmul_precision", "default"])
    enc = pd.read_csv(probs_csv)
    pivot = enc.pivot_table(index="data_ix", columns="category_ix",
                            values="prob")
    assign = pivot.to_numpy().argmax(-1)
    truth = df.loc[pivot.index, "label"].to_numpy()
    ari = adjusted_rand_index(truth, assign)
    clusters = {int(c): int(n) for c, n
                in zip(*np.unique(assign, return_counts=True))}
    config_tag = ("publication" if args.publication else
                  "%s-K%d-h%d" % (args.corpus, args.K, args.hidden))
    payload = {
        "seed": args.seed, "config": config_tag,
        "corpus": args.corpus, "classes":
            args.classes if args.corpus == "rich" else 2,
        "K": args.K,
        "greedy_decoder": args.greedy_decoder,
        "segments": args.segments, "epochs": args.epochs,
        "train_wall_s": round(train_wall, 1),
        "segments_per_sec_train": round(
            args.segments * 0.9 * args.epochs / train_wall, 1),
        "ari_vs_ground_truth": round(float(ari), 4),
        "num_clusters_used": len(clusters),
        "cluster_sizes": clusters,
    }
    demo_path = os.path.join(REPO, "DEMO.json")
    existing = []
    if os.path.isfile(demo_path):
        prev = json.load(open(demo_path))
        existing = prev if isinstance(prev, list) else [prev]
    existing = [e for e in existing
                if (e.get("seed"), e.get("config")) !=
                   (args.seed, config_tag)] + [payload]
    with open(demo_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
