"""Golden parity run: train the PyTorch reference and this framework on
the same toy-derived workload with the same hyperparameters, then compare
ELBO trajectories and final class assignments.

Cross-framework RNG makes bit-parity impossible (SURVEY.md hard part #4);
the parity claims are:
- per-epoch mean training/validation total loss curves agree within a
  relative tolerance after the first epochs;
- final cluster assignments agree up to label permutation (adjusted Rand
  index) between the two frameworks.

Writes PARITY.json at the repo root and prints a summary.

Usage: python scripts/parity_run.py [--epochs 20] [--segments 96]
       [--hidden 64] [-K 8]
"""

import argparse
import json
import math
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("REFERENCE_ROOT", "/root/reference")

import numpy as np
import pandas as pd


def adjusted_rand_index(a, b):
    """ARI without sklearn."""
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    classes_a, ia = np.unique(a, return_inverse=True)
    classes_b, ib = np.unique(b, return_inverse=True)
    table = np.zeros((len(classes_a), len(classes_b)), np.int64)
    for x, y in zip(ia, ib):
        table[x, y] += 1
    comb = lambda x: x * (x - 1) / 2.0
    sum_comb = comb(table).sum()
    sum_a = comb(table.sum(1)).sum()
    sum_b = comb(table.sum(0)).sum()
    total = comb(n)
    expected = sum_a * sum_b / total
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        return 1.0
    return (sum_comb - expected) / (max_index - expected)


def make_workload(args, out_dir):
    """Returns (wav_root, annotation_csv, truth_labels_by_index|None)."""
    if args.corpus == "demo2":
        # the two-class chirp-vs-noise corpus from scripts/demo_synthetic.py
        # — the one workload on which non-collapsed clustering of fully
        # distinct segments has been observed (DEMO.json ARI 0.958)
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from demo_synthetic import synth_corpus as demo_corpus
        dur = ((0.15, 0.35) if args.dur_range is None
               else tuple(args.dur_range))
        ann, df = demo_corpus(args.segments, out_dir, seed=args.corpus_seed,
                              dur_range=dur)
        return out_dir, ann, df["label"].to_dict()
    if args.corpus == "toyaug":
        # hundreds of DISTINCT augmented variants of the real toy
        # syllables (the one acoustic regime where the ABCD head
        # demonstrably commits in both frameworks) — see
        # scripts/toyaug_corpus.py
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from toyaug_corpus import toyaug_corpus
        g, r, n = args.toyaug_strength
        ann, df = toyaug_corpus(out_dir, args.segments,
                                seed=args.corpus_seed, gain_spread=g,
                                resample_spread=r, noise_rms=n)
        return out_dir, ann, df["label"].to_dict()
    if args.corpus == "synthetic":
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from synth_corpus import synth_corpus
        dur = ((0.10, 0.20) if args.dur_range is None
               else tuple(args.dur_range))
        ann, df = synth_corpus(out_dir, args.segments,
                               num_classes=args.classes,
                               seed=args.corpus_seed, jitter=args.jitter,
                               dur_range=dur,
                               unique_per_class=args.unique_per_class)
        return out_dir, ann, df["label"].to_dict()
    from toyaug_corpus import toy_data_root
    src = toy_data_root()
    csv = [f for f in os.listdir(src) if f.endswith(".csv")][0]
    df = pd.read_csv(os.path.join(src, csv))
    base = df[df.data_type == "train"]
    reps = -(-args.segments // len(base))
    big = pd.concat([base] * reps, ignore_index=True).iloc[:args.segments]
    out = pd.concat([big, df[df.data_type == "valid"]], ignore_index=True)
    path = os.path.join(out_dir, "ann.csv")
    out.to_csv(path, index=False)
    return src, path, None


# ---------------------------------------------------------------------
def run_reference(wav_root, ann, args, work):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from measure_reference_baseline import patch_torch
    patch_torch()
    sys.path.insert(0, os.path.join(REFERENCE, "ABCD-VAE"))
    import torch
    from modules import data_utils
    import learning as ref_learning

    save_dir = os.path.join(work, "ref-run")
    os.makedirs(save_dir, exist_ok=True)
    parser = data_utils.Data_Parser(wav_root, ann)
    fs = parser.get_sample_freq()
    frame, step = int(0.008 * fs), int(0.004 * fs)
    learner = ref_learning.Learner(
        int(frame / 2 + 1), args.hidden, args.hidden, args.hidden,
        args.K, args.feature_dim, save_dir, device="cpu", seed=args.seed,
        bidirectional_decoder=args.bidirectional_decoder,
        decoder_self_feedback=not args.greedy_decoder,
        prior_concentration=args.prior_concentration,
        num_speakers=parser.get_num_speakers(),
        speaker_embed_dim=args.speaker_embed_dim)
    trans = data_utils.Compose([
        data_utils.ToTensor(), data_utils.STFT(frame, step),
        data_utils.Transform(lambda x: (x + 2 ** -15).log() / 11.0)])
    datasets = {}
    for dt in ("train", "valid"):
        d = parser.get_data(data_type=dt, transform=trans)
        for col in ("onset_ix", "offset_ix", "length"):
            d.df_annotation[col] = d.df_annotation[col].astype(int)
        datasets[dt] = d
    t0 = time.time()
    learner.learn(datasets["train"], datasets["valid"], args.epochs,
                  args.batch_size, args.batch_size,
                  pretrain_epochs=args.pretrain_epochs, learning_rate=1.0,
                  momentum=args.momentum, gradient_clip=1.0,
                  patience=args.patience)
    wall = time.time() - t0

    # final assignments on the full annotation
    full = parser.get_data(transform=trans)
    for col in ("onset_ix", "offset_ix", "length"):
        full.df_annotation[col] = full.df_annotation[col].astype(int)
    dl = data_utils.DataLoader(full, batch_size=64)
    assign = {}
    with torch.no_grad():
        for packed, _, _, ixs in dl:
            h = learner.encoder(packed)
            logits = learner.feature_sampler(h)
            cls = logits.argmax(-1).numpy()
            for ix, c in zip(ixs, cls):
                assign[int(ix)] = int(c)
    curves = parse_history(os.path.join(save_dir, "history.log"))
    return curves, assign, wall


def run_ours(wav_root, ann, args, work):
    if args.device == "cpu":
        # Pin the platform before any backend initializes: a cpu-device
        # parity run must not grab (and exclusively hold) the tunneled
        # TPU, which would block concurrent bench/demo processes.
        import jax
        jax.config.update("jax_platforms", "cpu")
    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main
    from seq2seq_abcd_vae_tpu.cli.encode_main import main as encode_main
    save_root = os.path.join(work, "ours")
    t0 = time.time()
    argv = [
        wav_root, ann, "-S", save_root, "-j", "run", "-e", str(args.epochs),
        "--pretrain_epochs", str(args.pretrain_epochs),
        "-M", str(args.momentum),
        "-b", str(args.batch_size), "-K", str(args.K), "-f",
        str(args.feature_dim), "--encoder_rnn_hidden_size",
        str(args.hidden), "--decoder_rnn_hidden_size", str(args.hidden),
        "--mlp_hidden_size", str(args.hidden), "-N", "11.0", "-d",
        args.device, "-s", str(args.seed), "-p", str(args.patience),
        "--matmul_precision", args.matmul_precision,
        # reference uniform-draw semantics unless the ordering knob is on;
        # passing both uniform AND --length_sorted_batches used to make the
        # flag a silent no-op (Learner lets batching_mode win)
        "--batching_mode",
        "length_sorted" if args.length_sorted_batches else "uniform",
        "--prior_concentration", str(args.prior_concentration)]
    if args.speaker_embed_dim:
        argv += ["--speaker_embed_dim", str(args.speaker_embed_dim)]
    if args.bidirectional_decoder:
        argv.append("--bidirectional_decoder")
    if args.greedy_decoder:
        argv.append("--greedy_decoder")
    learn_main("abcd", argv)
    wall = time.time() - t0
    probs_csv = os.path.join(work, "ours-probs.csv")
    encode_main("probs", [
        os.path.join(save_root, "run", "checkpoint.pt"), wav_root, ann,
        "11.0", "-S", probs_csv, "-b", "64", "-d", args.device])
    df = pd.read_csv(probs_csv)
    pivot = df.pivot_table(index="data_ix", columns="category_ix",
                           values="prob")
    assign = {int(ix): int(np.argmax(row.to_numpy()))
              for ix, row in pivot.iterrows()}
    curves = parse_history(os.path.join(save_root, "run", "history.log"))
    return curves, assign, wall


def parse_history(path):
    txt = open(path).read()
    grab = lambda pat: [float(m) for m in re.findall(pat, txt)]
    return {
        "train_total": grab(
            r"mean training total loss \(per string\): *(-?[\d.]+)"),
        "valid_total": grab(
            r"mean validation total loss \(per string\): *(-?[\d.]+)"),
        "lr": grab(r"current learning rate: ([\d.e+-]+)"),
        "train_kl": grab(r"mean training KL \(per string\): *(-?[\d.]+)"),
        # posterior sharpness trajectory: perplexity of the clustering
        # probs per logged minibatch (K = uniform/undecided, 1 = hard
        # commit)
        "posterior_perplexity": grab(
            r"Perplexity of the posterior clustering probs\.: "
            r"(\d+(?:\.\d+)?)"),
    }


def cluster_histogram(assign):
    import collections
    return dict(collections.Counter(assign.values()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--pretrain_epochs", type=int, default=5)
    ap.add_argument("--segments", type=int, default=96)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("-K", type=int, default=8)
    ap.add_argument("--feature_dim", type=int, default=16)
    ap.add_argument("--device", type=str, default="cpu")
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--corpus",
                    choices=("toy", "synthetic", "demo2", "toyaug"),
                    default="toy",
                    help="'synthetic' = seed-stable multi-class corpus "
                         "(scripts/synth_corpus.py); 'toy' = replicated "
                         "reference toy_data segments")
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--dur_range", type=float, nargs=2,
                    default=None,
                    help="segment duration range (s); default = the "
                         "corpus's own default (synthetic 0.10-0.20, "
                         "demo2 0.15-0.35); longer segments "
                         "mean more frames per string, which raises the "
                         "emission/KL ratio and with it the pressure to "
                         "use the latent categories")
    ap.add_argument("--jitter", type=float, default=1.0,
                    help="within-class acoustic variation scale for the "
                         "synthetic corpus (0 = per-class templates)")
    ap.add_argument("--unique_per_class", type=int, default=None,
                    help="render only this many distinct segments per "
                         "class; remaining rows re-reference them "
                         "byte-identically (the toy-corpus regime where "
                         "the ABCD head actually commits to clusters)")
    ap.add_argument("--toyaug_strength", type=float, nargs=3,
                    default=(0.4, 0.05, 0.02),
                    metavar=("GAIN", "RESAMPLE", "NOISE"),
                    help="toyaug augmentation scales (gain spread, "
                         "resample spread, noise rms); 0 0 0 = replicated"
                         " regime")
    ap.add_argument("--corpus_seed", type=int, default=0,
                    help="corpus generation seed (fixed across run seeds "
                         "so every seed trains on the identical corpus)")
    ap.add_argument("--bidirectional_decoder", action="store_true",
                    help="the reference's documented anti-collapse option "
                         "(learning.py:383) — NOTE: unrunnable in the "
                         "unmodified reference (model.py:224 torch.cat on "
                         "the LSTM (h,c) tuple; model.py:258 BCE on "
                         "emission params); kept for ours-only runs")
    ap.add_argument("--greedy_decoder", action="store_true",
                    help="no decoder self-feedback (learning.py:380): the "
                         "reference's working anti-collapse option; use "
                         "for seed-stable parity corpora")
    ap.add_argument("--patience", type=int, default=0)
    ap.add_argument("--momentum", type=float, default=0.0,
                    help="SGD momentum (-M in both CLIs)")
    ap.add_argument("--matmul_precision", default="highest",
                    help="ours-side matmul precision; 'default' (bf16) is "
                         "the production setting and the one the seed-3 "
                         "demo2 clustering success used")
    ap.add_argument("--length_sorted_batches", action="store_true",
                    help="ours-side data-ordering policy (no reference "
                         "analogue); trajectory knob only — cross-ARI is "
                         "label-permutation-invariant")
    ap.add_argument("--speaker_embed_dim", type=int, default=None,
                    help="speaker embedding fed to the decoder (both "
                         "frameworks); None disables it")
    ap.add_argument("--prior_concentration", type=float, default=1.0)
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--out_name", type=str, default="PARITY.json")
    ap.add_argument("--work_dir", type=str, default=None,
                    help="persistent working directory; kept on exit. If "
                         "it already holds a ref-run/checkpoint.pt the "
                         "reference Learner auto-resumes from it "
                         "(learning.py retrieval path), so a timed-out "
                         "pub-scale run can be continued instead of "
                         "restarted. The corpus is regenerated "
                         "deterministically from --corpus_seed.")
    args = ap.parse_args()

    if args.work_dir:
        work = args.work_dir
        os.makedirs(work, exist_ok=True)
    else:
        work = tempfile.mkdtemp(prefix="parity-")
    wav_root, ann, truth = make_workload(args, work)

    payload = {"config": vars(args)}
    ours_assign = None
    if not args.skip_ours:
        ours_curves, ours_assign, ours_wall = run_ours(wav_root, ann, args,
                                                       work)
        payload["ours"] = {"curves": ours_curves, "wall_s": ours_wall,
                           "assignments": {str(k): v for k, v
                                           in sorted(ours_assign.items())}}
        if truth is not None:
            keys = sorted(ours_assign)
            payload["ours"]["ari_vs_truth"] = adjusted_rand_index(
                [truth[k] for k in keys], [ours_assign[k] for k in keys])
            payload["ours"]["clusters"] = cluster_histogram(ours_assign)
    if not args.skip_reference:
        ref_curves, ref_assign, ref_wall = run_reference(wav_root, ann, args,
                                                         work)
        payload["reference"] = {"curves": ref_curves, "wall_s": ref_wall,
                                "assignments": {str(k): v for k, v
                                                in sorted(ref_assign.items())}}
        if truth is not None:
            keys = sorted(ref_assign)
            payload["reference"]["ari_vs_truth"] = adjusted_rand_index(
                [truth[k] for k in keys], [ref_assign[k] for k in keys])
            payload["reference"]["clusters"] = cluster_histogram(ref_assign)
    if ours_assign is not None and not args.skip_reference:
        keys = sorted(set(ours_assign) & set(ref_assign))
        ari = adjusted_rand_index([ref_assign[k] for k in keys],
                                  [ours_assign[k] for k in keys])
        rel = [abs(o - r) / abs(r) for o, r in
               zip(ours_curves["train_total"], ref_curves["train_total"])]
        payload["comparison"] = {
            "assignment_ari_ref_vs_ours": ari,
            "train_total_rel_diff_per_epoch": rel,
            "final_train_total": {"ref": ref_curves["train_total"][-1],
                                  "ours": ours_curves["train_total"][-1]},
            "cluster_histogram": {"ref": cluster_histogram(ref_assign),
                                  "ours": cluster_histogram(ours_assign)},
        }
    with open(os.path.join(REPO, args.out_name), "w") as f:
        json.dump(payload, f, indent=1)
    summary = payload.get("comparison") or {
        k: v for k, v in payload.items() if k != "config"}
    print(json.dumps(summary, indent=1))
    if not args.work_dir:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
