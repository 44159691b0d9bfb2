"""Pre-staged runbook for the real-birdsong quality north star.

BASELINE.json's remaining quality target is the Morita et al. 2021
birdsong clustering (reference README.md:60-80: K=128, f=256, batch 512,
20 epochs, pretrain 5, N=11.0, 8 ms frames / 4 ms steps, speaker
embedding 256).  This container has no network egress, so the corpus
must be driver-mounted; this script is everything needed to close the
north star the session the data appears:

    # 1. validate the mounted corpus + print the plan (no training)
    python scripts/birdsong_runbook.py /mnt/birdsong ann.csv

    # 2. run it (training + encode + cluster metrics)
    python scripts/birdsong_runbook.py /mnt/birdsong ann.csv --run \
        --save_root results/birdsong

Annotation schema is the reference's:
``input_path,onset,offset,data_type[,speaker][,label]`` with onset/offset
in seconds and data_type in {train, valid}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd

PUBLICATION = dict(K=128, feature_dim=256, hidden=256, batch_size=512,
                   epochs=20, pretrain_epochs=5, normalizer=11.0,
                   speaker_embed_dim=256, clip=1.0, patience=0, lr=1.0)
# measured round-2 training throughput on the tunneled v5e (BENCH_r02)
MEASURED_SEG_PER_S = 37_000.0


def validate(input_root: str, ann_path: str) -> pd.DataFrame:
    df = pd.read_csv(ann_path)
    required = {"input_path", "onset", "offset", "data_type"}
    missing = required - set(df.columns)
    if missing:
        raise SystemExit(f"annotation is missing columns: {sorted(missing)}")
    bad_types = set(df.data_type.unique()) - {"train", "valid", "test"}
    if bad_types:
        raise SystemExit(f"unexpected data_type values: {sorted(bad_types)}")
    lost = [p for p in df.input_path.unique()
            if not os.path.isfile(os.path.join(input_root, p))]
    if lost:
        raise SystemExit(f"{len(lost)} wav files missing under {input_root}; "
                         f"first: {lost[:3]}")
    neg = df[df.offset <= df.onset]
    if len(neg):
        raise SystemExit(f"{len(neg)} rows with offset <= onset "
                         f"(first index {neg.index[0]})")
    return df


def plan(df: pd.DataFrame) -> dict:
    durs = (df.offset - df.onset).to_numpy()
    n_train = int((df.data_type == "train").sum())
    steps_per_epoch = -(-n_train // PUBLICATION["batch_size"])
    est_train_s = n_train * PUBLICATION["epochs"] / MEASURED_SEG_PER_S
    return {
        "segments": int(len(df)),
        "train_segments": n_train,
        "valid_segments": int((df.data_type == "valid").sum()),
        "speakers": (int(df.speaker.nunique())
                     if "speaker" in df.columns else 0),
        "has_labels": bool("label" in df.columns),
        "duration_s": {"median": float(np.median(durs)),
                       "p95": float(np.percentile(durs, 95)),
                       "max": float(durs.max())},
        "steps_per_epoch": steps_per_epoch,
        "estimated_training_wall": "%.1f min" % (est_train_s / 60.0),
        "config": PUBLICATION,
    }


def run(input_root: str, ann_path: str, save_root: str, seed: int,
        device: str) -> None:
    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main
    from seq2seq_abcd_vae_tpu.cli.encode_main import main as encode_main
    p = PUBLICATION
    job = f"birdsong-s{seed}"
    t0 = time.time()
    learn_main("abcd", [
        input_root, ann_path, "-S", save_root, "-j", job,
        "-e", str(p["epochs"]), "--pretrain_epochs", str(p["pretrain_epochs"]),
        "-b", str(p["batch_size"]), "-K", str(p["K"]),
        "-f", str(p["feature_dim"]),
        "--encoder_rnn_hidden_size", str(p["hidden"]),
        "--decoder_rnn_hidden_size", str(p["hidden"]),
        "--mlp_hidden_size", str(p["hidden"]),
        "--speaker_embed_dim", str(p["speaker_embed_dim"]),
        "-N", str(p["normalizer"]), "-p", str(p["patience"]),
        "-s", str(seed), "-d", device])
    train_wall = time.time() - t0
    probs_csv = os.path.join(save_root, job, "encoded_probs.csv")
    encode_main("probs", [
        os.path.join(save_root, job, "checkpoint.pt"), input_root, ann_path,
        str(p["normalizer"]), "-S", probs_csv, "-b", "256", "-d", device])
    out = {"train_wall_s": train_wall, "probs_csv": probs_csv}
    dfp = pd.read_csv(probs_csv)
    pivot = dfp.pivot_table(index="data_ix", columns="category_ix",
                            values="prob")
    assign = pivot.to_numpy().argmax(-1)
    out["clusters_used"] = int(len(np.unique(assign)))
    ann = pd.read_csv(ann_path)
    if "label" in ann.columns:
        labels = ann.loc[pivot.index, "label"].to_numpy()
        sys.path.insert(0, os.path.dirname(__file__))
        from parity_run import adjusted_rand_index
        out["ari_vs_label"] = adjusted_rand_index(labels, assign)
    report = os.path.join(save_root, job, "birdsong_report.json")
    with open(report, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input_root")
    ap.add_argument("annotation_file")
    ap.add_argument("--run", action="store_true",
                    help="actually train + encode (default: validate and "
                         "print the plan only)")
    ap.add_argument("--save_root", default="results/birdsong")
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--device", default="tpu")
    args = ap.parse_args()
    df = validate(args.input_root, args.annotation_file)
    print(json.dumps(plan(df), indent=1))
    if args.run:
        run(args.input_root, args.annotation_file, args.save_root,
            args.seed, args.device)


if __name__ == "__main__":
    main()
