"""End-to-end export interop check: train here, export to a torch
checkpoint, run the UNMODIFIED reference encode.py on it, and compare
the reference's class probabilities against our encode_main's.

Closes the interop loop (reference learning.py:317-347 + encode.py):
models trained in this framework become consumable by existing
reference-based analysis pipelines.

Usage: python scripts/verify_export_against_reference.py [--epochs 3]
Writes EXPORT_PARITY.json at the repo root.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
REFERENCE = os.environ.get("REFERENCE_ROOT", "/root/reference")

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--segments", type=int, default=48)
    ap.add_argument("--device", type=str, default="cpu")
    args = ap.parse_args()

    from synth_corpus import synth_corpus

    from seq2seq_abcd_vae_tpu.cli.encode_main import main as encode_main
    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main
    from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt
    from seq2seq_abcd_vae_tpu.train.torch_export import \
        export_torch_checkpoint

    work = tempfile.mkdtemp(prefix="export-parity-")
    ann, _ = synth_corpus(work, args.segments, num_classes=3, seed=0)

    # 1. train a small model here
    learn_main("abcd", [
        work, ann, "-S", work, "-j", "run", "-e", str(args.epochs),
        "--pretrain_epochs", "1", "-b", "16", "-K", "6", "-f", "8",
        "--encoder_rnn_hidden_size", "16", "--decoder_rnn_hidden_size",
        "16", "--mlp_hidden_size", "16", "-N", "11.0", "-d", args.device,
        "--speaker_embed_dim", "4", "-s", "1111"])
    our_ckpt = os.path.join(work, "run", "checkpoint.pt")

    # 2. our probs
    ours_csv = os.path.join(work, "ours.csv")
    encode_main("probs", [our_ckpt, work, ann, "11.0", "-S", ours_csv,
                          "-b", "16", "-d", args.device])

    # 3. export, then run the UNMODIFIED reference encode.py machinery
    # (imported under the torch-2 compat shims of
    # measure_reference_baseline; pandas-2 needs the same explicit int
    # casts parity_run.py applies — a reference-era pandas quirk, not a
    # model difference)
    import torch
    exported = os.path.join(work, "exported", "checkpoint.pt")
    os.makedirs(os.path.dirname(exported))
    payload = ckpt.load_checkpoint(our_ckpt)
    torch.save(export_torch_checkpoint(payload), exported)

    from measure_reference_baseline import patch_torch
    patch_torch()
    sys.path.insert(0, os.path.join(REFERENCE, "ABCD-VAE"))
    from modules import data_utils as ref_data_utils
    import encode as ref_encode

    frame = int(0.008 * 16000)
    trans = ref_data_utils.Compose([
        ref_data_utils.ToTensor(),
        ref_data_utils.STFT(frame, int(0.004 * 16000)),
        ref_data_utils.Transform(lambda x: (x + 2 ** -15).log() / 11.0)])
    parser = ref_data_utils.Data_Parser(work, ann)
    dataset = parser.get_data(transform=trans)
    for col in ("onset_ix", "offset_ix", "length"):
        dataset.df_annotation[col] = dataset.df_annotation[col].astype(int)
    ref_csv = os.path.join(work, "reference.csv")
    ref_enc = ref_encode.Encoder(exported, device="cpu")
    ref_enc.encode_dataset(dataset, ref_csv, batch_size=16)

    # 4. compare
    ours = pd.read_csv(ours_csv).pivot_table(
        index="data_ix", columns="category_ix", values="prob")
    ref = pd.read_csv(ref_csv).pivot_table(
        index="data_ix", columns="category_ix", values="prob")
    common = ours.index.intersection(ref.index)
    a, b = ours.loc[common].to_numpy(), ref.loc[common].to_numpy()
    max_abs = float(np.abs(a - b).max())
    agree = float((a.argmax(1) == b.argmax(1)).mean())
    payload = {
        "segments": int(len(common)),
        "max_abs_prob_diff": max_abs,
        "argmax_agreement": agree,
        "pass": bool(max_abs < 5e-3 and agree == 1.0),
    }
    with open(os.path.join(REPO, "EXPORT_PARITY.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    assert payload["pass"], payload


if __name__ == "__main__":
    main()
