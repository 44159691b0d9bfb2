"""Convert a reference (PyTorch) checkpoint.pt into this framework's
checkpoint format.

Usage:
  python scripts/import_torch_checkpoint.py /path/to/torch/checkpoint.pt \
      /path/to/output_dir

Writes output_dir/checkpoint.pt loadable by every encode CLI and by the
training CLI for fine-tuning (optimizer starts fresh).
"""

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)


def main():
    src, out_dir = sys.argv[1], sys.argv[2]
    import torch
    from seq2seq_abcd_vae_tpu.train import checkpoint as ckpt
    from seq2seq_abcd_vae_tpu.train.torch_import import (
        import_torch_checkpoint)
    torch_ckpt = torch.load(src, map_location="cpu", weights_only=False)
    payload = import_torch_checkpoint(torch_ckpt)
    os.makedirs(out_dir, exist_ok=True)
    path = ckpt.save_checkpoint(out_dir, payload)
    print(f"imported {src} (epoch {payload['epoch']}, "
          f"{payload['latent_type']}) -> {path}")


if __name__ == "__main__":
    main()
