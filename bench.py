#!/usr/bin/env python
"""Benchmark: ABCD-VAE training throughput (segments/sec) on this repo's
TPU-native stack, vs the measured CPU-PyTorch reference baseline.

Workload = the reference's publication config (K=128, f=256, hidden 256,
speaker_embed 256, batch 512, STFT 8ms/4ms, N=11) on toy_data segments
replicated to 512 train rows — the same workload
scripts/measure_reference_baseline.py times for the reference.

Prints ONE JSON line:
{"metric": "train_segments_per_sec", "value": N, "unit": "segments/sec",
 "vs_baseline": N / reference_sps}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd


def find_toy_data():
    for root in (os.path.join(REPO, "toy_data"), "/root/reference/toy_data"):
        if os.path.isdir(root):
            for f in os.listdir(root):
                if f.startswith("annotation") and f.endswith(".csv"):
                    return root, os.path.join(root, f)
    raise FileNotFoundError("toy_data not found")


def replicated_annotation(csv_path: str, num_segments: int,
                          out_path: str) -> str:
    df = pd.read_csv(csv_path)
    base = df[df.data_type == "train"]
    reps = -(-num_segments // len(base))
    big = pd.concat([base] * reps, ignore_index=True).iloc[:num_segments]
    big["data_type"] = "train"
    out = pd.concat([big, df[df.data_type == "valid"]], ignore_index=True)
    out.to_csv(out_path, index=False)
    return out_path


def main():
    num_segments = int(os.environ.get("BENCH_SEGMENTS", 512))
    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", 512))
    timed_batches = int(os.environ.get("BENCH_BATCHES", 16))
    precision = os.environ.get("BENCH_MATMUL_PRECISION", "default")
    stft_method = os.environ.get("BENCH_STFT_METHOD", "fft")

    from seq2seq_abcd_vae_tpu.utils import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    import tempfile
    work = tempfile.mkdtemp(prefix="bench-")
    toy_root, toy_csv = find_toy_data()
    ann = replicated_annotation(toy_csv, num_segments,
                                os.path.join(work, "ann.csv"))

    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    from seq2seq_abcd_vae_tpu.train import optim
    from seq2seq_abcd_vae_tpu.train.learner import Learner, _train_step

    length_sorted = os.environ.get("BENCH_LENGTH_SORTED") == "1"

    parser = AnnotationParser(toy_root, ann)
    fs = parser.get_sample_freq()
    frame = int(np.floor(0.008 * fs))
    step = int(np.floor(0.004 * fs))

    save_dir = os.path.join(work, "run")
    os.makedirs(save_dir)
    learner = Learner(
        input_size=int(frame / 2 + 1),
        encoder_rnn_hidden_size=256, decoder_rnn_hidden_size=256,
        mlp_hidden_size=256, num_feature_categories=128, feature_dim=256,
        save_dir=save_dir, latent_type="abcd",
        num_speakers=parser.get_num_speakers(), speaker_embed_dim=256,
        matmul_precision=precision, stft_method=stft_method)

    fe = FrontendSpec(frame, step)
    train = parser.get_data("train")
    loader = DataLoader(train, fe, batch_size=batch_size, shuffle=True,
                        length_sorted=length_sorted)
    statics = learner._statics(fe, 2.0 ** -15, 11.0)
    learner.gradient_clip = 1.0
    learner._momentum = 0.0
    learner._tx = optim.make_optimizer(1.0, 0.0, 1.0)
    learner.opt_state = learner._tx.init(learner.params)

    import jax

    params, opt_state = learner.params, learner.opt_state
    keys = learner._epoch_keys(timed_batches + len(loader.dataset) + 4)
    kix = 0

    def run_batch(batch, placed, params, opt_state):
        nonlocal kix
        audio, num_frames, speakers = placed
        params, opt_state, metrics = _train_step(
            params, opt_state, audio, num_frames, speakers, keys[kix],
            float(num_segments), 1.0, statics=statics, no_sample=False,
            bucket_frames=batch.bucket_frames, tx=learner._tx)
        kix += 1
        return params, opt_state, metrics

    # Warmup epoch: compiles every bucket shape.
    for batch in loader:
        params, opt_state, m = run_batch(batch, learner._place_batch(batch),
                                         params, opt_state)
    jax.block_until_ready(params)

    # Timed: the pipelined steady state (async dispatch, prefetched
    # transfers, one sync at the end) — how the Learner actually trains.
    def batches():
        while True:
            yield from loader

    it = batches()
    # two untimed pipelined batches to absorb post-warmup retraces
    batch = next(it)
    placed = learner._place_batch(batch)
    for _ in range(2):
        params, opt_state, m = run_batch(batch, placed, params, opt_state)
        batch = next(it)
        placed = learner._place_batch(batch)
    jax.block_until_ready(params)

    t0 = time.perf_counter()
    done = 0
    for _ in range(timed_batches):
        params, opt_state, m = run_batch(batch, placed, params, opt_state)
        done += batch.num_real
        batch = next(it)
        placed = learner._place_batch(batch)
    jax.block_until_ready(params)  # wait for the last queued step
    timed = time.perf_counter() - t0

    sps = done / timed
    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs = None
    if os.path.isfile(baseline_path):
        ref = json.load(open(baseline_path)).get(
            "reference_train_segments_per_sec")
        if ref:
            vs = sps / ref
    print(json.dumps({"metric": "train_segments_per_sec",
                      "value": round(sps, 2), "unit": "segments/sec",
                      "vs_baseline": None if vs is None else round(vs, 2)}))


if __name__ == "__main__":
    main()
