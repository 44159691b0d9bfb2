"""Convert this framework's checkpoint.pt into a reference-loadable
PyTorch checkpoint — the inverse of scripts/import_torch_checkpoint.py.

Usage:
  python scripts/export_torch_checkpoint.py /path/to/our/checkpoint.pt \
      /path/to/output/checkpoint.pt

The output loads in the unmodified reference (ABCD-VAE/learning.py
retrieve_model and every encode*.py); verify with
scripts/verify_export_against_reference.py.
"""

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("output")
    ap.add_argument("--learning_rate", type=float, default=1.0,
                    help="lr recorded in the exported optimizer group")
    args = ap.parse_args(argv)

    import torch

    from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt
    from seq2seq_abcd_vae_tpu.train.torch_export import \
        export_torch_checkpoint

    payload = ckpt.load_checkpoint(args.ours)
    out = export_torch_checkpoint(payload, learning_rate=args.learning_rate)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(out, args.output)
    print("wrote", args.output)


if __name__ == "__main__":
    main()
