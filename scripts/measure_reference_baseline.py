"""Measure the reference implementation's CPU training throughput.

The reference (/root/reference, PyTorch-1.2-era) predates torch 2.x; two
shims make it runnable unmodified for benchmarking only:
- Tensor.stft defaulted to a real view (freq, frames, 2); wrap the modern
  complex return with view_as_real;
- torch._six.inf (used at pretraining end) no longer exists.

Writes BASELINE_MEASURED.json at the repo root:
{"reference_train_segments_per_sec": ..., "config": {...}}

Usage: python scripts/measure_reference_baseline.py [--segments 512]
       [--batch_size 512] [--batches 3]
"""

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
import types

import pandas as pd

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
REFERENCE = os.environ.get("REFERENCE_ROOT", "/root/reference")


def patch_torch():
    import torch
    if not hasattr(torch, "_six"):
        six = types.ModuleType("torch._six")
        six.inf = math.inf
        torch._six = six
        sys.modules["torch._six"] = six

    orig_stft = torch.functional.stft

    def stft_realview(self, *args, **kwargs):
        kwargs.setdefault("return_complex", True)
        return torch.view_as_real(orig_stft(self, *args, **kwargs))

    torch.Tensor.stft = stft_realview

    # torch>=2 clip_grad_norm_'s foreach path can't take SparseCPU grads
    # (the reference's sparse speaker embedding, model.py:118, hits this
    # at learning.py:161); densify first — numerically identical under
    # plain SGD.
    orig_clip = torch.nn.utils.clip_grad_norm_

    def clip_densify(parameters, *a, **k):
        params = ([parameters] if isinstance(parameters, torch.Tensor)
                  else list(parameters))
        for p in params:
            if p.grad is not None and p.grad.is_sparse:
                p.grad = p.grad.to_dense()
        return orig_clip(params, *a, **k)

    torch.nn.utils.clip_grad_norm_ = clip_densify


def replicated_annotation(num_segments: int, out_dir: str) -> str:
    """Tile the toy annotation up to num_segments rows (all 'train' plus
    two 'valid') so throughput is measured on realistic batch sizes."""
    src_csv = os.path.join(
        REFERENCE, "toy_data",
        "annotation_20170806-080002_89.2-94.22.csv")
    df = pd.read_csv(src_csv)
    base = df[df.data_type == "train"]
    reps = -(-num_segments // len(base))
    big = pd.concat([base] * reps, ignore_index=True).iloc[:num_segments]
    big["data_type"] = "train"
    out = pd.concat([big, df[df.data_type == "valid"]], ignore_index=True)
    path = os.path.join(out_dir, "bench_annotation.csv")
    out.to_csv(path, index=False)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--batches", type=int, default=3,
                    help="timed batches (after a 1-batch warmup)")
    ap.add_argument("--corpus", choices=("toy", "synthetic"),
                    default="toy",
                    help="'synthetic' = the mixed-length corpus bench.py "
                         "trains on (scripts/synth_corpus.py), measured "
                         "under the key "
                         "reference_train_segments_per_sec_synthetic")
    args = ap.parse_args()

    patch_torch()
    sys.path.insert(0, os.path.join(REFERENCE, "ABCD-VAE"))
    import torch
    from modules import data_utils, model  # noqa: F401  (reference modules)
    import learning as ref_learning

    work = tempfile.mkdtemp(prefix="refbench-")
    if args.corpus == "synthetic":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from synth_corpus import synth_corpus
        ann, _ = synth_corpus(work, args.segments, num_classes=8, seed=0,
                              dur_range=(0.10, 0.50), valid_every=16)
        wav_root = work
    else:
        ann = replicated_annotation(args.segments, work)
        wav_root = os.path.join(REFERENCE, "toy_data")
    save_dir = os.path.join(work, "run")
    os.makedirs(save_dir)

    parser = data_utils.Data_Parser(wav_root, ann)
    fs = parser.get_sample_freq()
    frame = int(0.008 * fs)
    step = int(0.004 * fs)

    learner = ref_learning.Learner(
        int(frame / 2 + 1), 256, 256, 256, 128, 256, save_dir,
        device="cpu", num_speakers=parser.get_num_speakers(),
        speaker_embed_dim=256)

    to_tensor = data_utils.ToTensor()
    stft = data_utils.STFT(frame, step)
    trans = data_utils.Compose([
        to_tensor, stft,
        data_utils.Transform(lambda x: (x + 2 ** -15).log() / 11.0)])
    train = parser.get_data(data_type="train", transform=trans)
    # pandas>=2 keeps float dtype on .loc column reassignment, breaking the
    # reference's int slicing (data_utils.py:77-78); force int here.
    for col in ("onset_ix", "offset_ix", "length"):
        train.df_annotation[col] = train.df_annotation[col].astype(int)

    dataloader = data_utils.DataLoader(train, batch_size=args.batch_size,
                                       shuffle=True)
    learner.gradient_clip = 1.0
    learner.optimizer = torch.optim.SGD(learner.parameters(), lr=1.0)

    it = iter(dataloader)
    # warmup batch
    _train_one(learner, next(it))
    timed, done = 0.0, 0
    for _ in range(args.batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(dataloader)
            batch = next(it)
        t0 = time.perf_counter()
        n = _train_one(learner, batch)
        timed += time.perf_counter() - t0
        done += n
    sps = done / timed

    key = ("reference_train_segments_per_sec_synthetic"
           if args.corpus == "synthetic"
           else "reference_train_segments_per_sec")
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    payload = {}
    if os.path.isfile(out_path):  # merge: keep the other corpus' number
        payload = json.load(open(out_path))
    payload[key] = sps
    payload["hardware"] = "cpu (PyTorch {})".format(torch.__version__)
    payload["config_" + args.corpus] = {
        "segments": args.segments,
        "batch_size": args.batch_size,
        "batches_timed": args.batches,
        "model": "ABCD publication config (K=128, f=256, "
                 "hidden 256, speaker_embed 256)"}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    shutil.rmtree(work, ignore_errors=True)


def _train_one(learner, batch) -> int:
    import torch
    packed_input, is_offset, speaker, _ = batch
    learner.optimizer.zero_grad()
    last_hidden = learner.encoder(packed_input)
    logits = learner.feature_sampler(last_hidden)
    features = learner.feature_sampler.sample(logits)
    kl = learner.feature_sampler.kl_divergence(logits, 512)
    em, off, _, _, _ = learner.decoder(
        features, batch_sizes=packed_input.batch_sizes, speaker=speaker,
        ground_truth_out=packed_input.data, ground_truth_offset=is_offset.data)
    loss = (em + off + kl) / packed_input.batch_sizes[0]
    loss.backward()
    torch.nn.utils.clip_grad_norm_(learner.parameters(),
                                   learner.gradient_clip)
    learner.optimizer.step()
    return int(packed_input.batch_sizes[0])


if __name__ == "__main__":
    main()
