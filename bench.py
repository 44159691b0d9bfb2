#!/usr/bin/env python
"""Benchmark: ABCD-VAE training + encode throughput (segments/sec) on this
repo's TPU-native stack, vs the measured CPU-PyTorch reference baseline.

Workload = the reference's publication config (K=128, f=256, hidden 256,
speaker_embed 256, batch 512, STFT 8ms/4ms, N=11) on a SELF-CONTAINED
synthetic mixed-length corpus (scripts/synth_corpus.py: 512 distinct
segments, 8 syllable classes, 0.1-0.5 s durations) — a realistic
length distribution rather than 6 replicated toy segments.
BENCH_WORKLOAD=toy reproduces the round-1 replicated-toy workload
(requires /root/reference/toy_data).

Prints ONE JSON line:
{"metric": "train_segments_per_sec", "value": N, "unit": "segments/sec",
 "vs_baseline": N / reference_sps, "extra": {encode sps, backends,
 padding stats, ...}}

Env knobs: BENCH_SEGMENTS, BENCH_BATCH_SIZE, BENCH_BATCHES,
BENCH_MATMUL_PRECISION, BENCH_STFT_METHOD, BENCH_LENGTH_SORTED,
BENCH_WORKLOAD, SEQ2SEQ_RNN_BACKEND (scan|pallas|auto),
SEQ2SEQ_SCAN_UNROLL.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np
import pandas as pd


def replicated_toy_annotation(num_segments: int, work: str):
    from toyaug_corpus import toy_data_root
    root = toy_data_root()
    csv_path = [os.path.join(root, f) for f in os.listdir(root)
                if f.startswith("annotation") and f.endswith(".csv")][0]
    df = pd.read_csv(csv_path)
    base = df[df.data_type == "train"]
    reps = -(-num_segments // len(base))
    big = pd.concat([base] * reps, ignore_index=True).iloc[:num_segments]
    big["data_type"] = "train"
    out = pd.concat([big, df[df.data_type == "valid"]], ignore_index=True)
    ann = os.path.join(work, "ann.csv")
    out.to_csv(ann, index=False)
    return root, ann


def make_workload(num_segments: int, work: str):
    if os.environ.get("BENCH_WORKLOAD", "synthetic") == "toy":
        return replicated_toy_annotation(num_segments, work)
    from synth_corpus import synth_corpus
    ann, _ = synth_corpus(work, num_segments, num_classes=8, seed=0,
                          dur_range=(0.10, 0.50), valid_every=16)
    return work, ann


def main():
    num_segments = int(os.environ.get("BENCH_SEGMENTS", 512))
    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", 512))
    timed_batches = int(os.environ.get("BENCH_BATCHES", 16))
    precision = os.environ.get("BENCH_MATMUL_PRECISION", "default")
    stft_method = os.environ.get("BENCH_STFT_METHOD", "fft")
    length_sorted = os.environ.get("BENCH_LENGTH_SORTED") == "1"

    from seq2seq_abcd_vae_tpu.utils import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    import tempfile
    work = tempfile.mkdtemp(prefix="bench-")
    wav_root, ann = make_workload(num_segments, work)

    from seq2seq_abcd_vae_tpu.data.annotations import AnnotationParser
    from seq2seq_abcd_vae_tpu.data.batching import DataLoader, FrontendSpec
    from seq2seq_abcd_vae_tpu.train import optim
    from seq2seq_abcd_vae_tpu.train.learner import Learner, _train_step

    parser = AnnotationParser(wav_root, ann)
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
    bmode = ("length_sorted" if length_sorted else
             os.environ.get("BENCH_BATCHING_MODE", "bucket_shuffled"))
    # pad_to_batch_size=False matches the Learner's off-mesh behavior:
    # partial batches run at their true row count (data/batching.py)
    loader = DataLoader(train, fe, batch_size=batch_size, shuffle=True,
                        batching_mode=bmode, pad_to_batch_size=False)
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
    train_sps = done / timed

    # ------------------------------------------------------------------
    # Encode path (BASELINE.json names train AND encode segments/sec):
    # checkpoint the trained params, reload through the real inference
    # Encoder, and time the streamed CSV encode end-to-end.
    learner.params = params
    learner.opt_state = opt_state
    learner.lr_scheduler = optim.ReduceLROnPlateau()
    learner.save_model(epoch=1)
    learner._checkpointer.wait()

    from seq2seq_abcd_vae_tpu.infer.encode import Encoder
    enc = Encoder(os.path.join(save_dir, "checkpoint.pt"),
                  matmul_precision=precision, stft_method=stft_method)
    full = parser.get_data()  # all rows, like the encode CLI
    enc_csv = os.path.join(work, "probs.csv")
    enc.encode_dataset(full, enc_csv, fe, 2.0 ** -15, 11.0, mode="probs",
                       batch_size=batch_size)  # warmup (compiles buckets)
    t0 = time.perf_counter()
    enc.encode_dataset(full, enc_csv, fe, 2.0 ** -15, 11.0, mode="probs",
                       batch_size=batch_size)
    encode_sps = len(full) / (time.perf_counter() - t0)

    # ------------------------------------------------------------------
    from seq2seq_abcd_vae_tpu.utils.backend_select import backend_report
    stats_loader = DataLoader(train, fe, batch_size=batch_size,
                              shuffle=True, batching_mode=bmode,
                              pad_to_batch_size=False)
    pad_stats = stats_loader.epoch_padding_stats()

    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    vs = ref_sps = None
    if os.path.isfile(baseline_path):
        baseline = json.load(open(baseline_path))
        key = ("reference_train_segments_per_sec_synthetic"
               if os.environ.get("BENCH_WORKLOAD", "synthetic") != "toy"
               else "reference_train_segments_per_sec")
        ref_sps = baseline.get(key,
                               baseline.get(
                                   "reference_train_segments_per_sec"))
        if ref_sps:
            vs = train_sps / ref_sps

    extra = {
        "encode_segments_per_sec": round(encode_sps, 2),
        "workload": os.environ.get("BENCH_WORKLOAD", "synthetic"),
        "stft_method": stft_method,
        "scan_unroll": os.environ.get("SEQ2SEQ_SCAN_UNROLL", "4"),
        "matmul_precision": precision,
        "length_sorted": length_sorted,
        "batching_mode": bmode,
        "bucket_edges": stats_loader.bucket_edges,
        "frame_waste_frac": round(pad_stats["frame_waste_frac"], 4),
        "reference_sps": ref_sps,
    }
    extra.update(backend_report())
    print(json.dumps({"metric": "train_segments_per_sec",
                      "value": round(train_sps, 2),
                      "unit": "segments/sec",
                      "vs_baseline": None if vs is None else round(vs, 2),
                      "extra": extra}))


if __name__ == "__main__":
    main()
