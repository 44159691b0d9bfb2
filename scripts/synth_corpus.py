"""Synthetic multi-class acoustic corpus generator.

Produces a wav + annotation CSV in the reference's schema
(/root/reference/README.md:30-47: columns input_path,onset,offset,
data_type,speaker,label) with `num_classes` acoustically distinct
syllable archetypes and per-segment jitter (duration, pitch, amplitude),
so that clustering is learnable but not memorizable.  Used by
scripts/parity_run.py (seed-stable cross-framework parity corpus) and
scripts/demo_synthetic.py (K=128 publication-config demo).

Archetypes are spread over the 0-8 kHz band (65 STFT bins at the
reference's 8 ms frames / 16 kHz): harmonic tone stacks, rising/falling
chirps, band-limited noise bursts and amplitude-modulated trills.
"""

import os

import numpy as np
import pandas as pd
import scipy.io.wavfile as spw

FS = 16000


def _archetype(kind, params, t, dur, rng, jitter=1.0):
    """Render one segment of duration dur (seconds) at sample times t.

    jitter in [0, 1] scales all per-segment random variation (frequency,
    AM-rate); at 0 every segment of a class is the same template (apart
    from additive noise and duration), which makes the clustering easy
    enough to be seed-stable — the regime the parity corpus needs.
    """
    fj = lambda lo, hi: rng.uniform(1.0 + (lo - 1.0) * jitter,
                                    1.0 + (hi - 1.0) * jitter)
    if kind == "tone":  # harmonic stack, jittered fundamental
        f0 = params["f0"] * fj(0.92, 1.08)
        seg = sum(np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1)
                  for k in range(params.get("harmonics", 3)))
    elif kind == "chirp":  # linear sweep f0 -> f1
        f0 = params["f0"] * fj(0.92, 1.08)
        f1 = params["f1"] * fj(0.92, 1.08)
        seg = np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t * t / (2 * dur)))
    elif kind == "noise":  # band-limited noise via ring modulation
        carrier = np.sin(2 * np.pi * params["fc"] * fj(0.95, 1.05) * t)
        lp = rng.normal(size=t.shape)
        width = max(1, int(FS / params.get("bw", 1000.0)))
        kernel = np.ones(width) / width
        seg = np.convolve(lp, kernel, mode="same") * carrier * 3.0
    elif kind == "trill":  # AM-modulated tone
        f0 = params["f0"] * fj(0.92, 1.08)
        rate = params["rate"] * fj(0.85, 1.15)
        seg = np.sin(2 * np.pi * f0 * t) * (0.55 + 0.45 * np.sin(
            2 * np.pi * rate * t))
    else:
        raise ValueError(kind)
    return seg


def class_bank(num_classes, rng):
    """Deterministic list of `num_classes` archetype specs, spectrally
    spread so neighbours in frequency differ in kind."""
    base = [
        ("tone", {"f0": 450.0, "harmonics": 2}),
        ("trill", {"f0": 2800.0, "rate": 30.0}),
        ("noise", {"fc": 6800.0, "bw": 1200.0}),
        ("trill", {"f0": 2000.0, "rate": 30.0}),
        ("chirp", {"f0": 3500.0, "f1": 1500.0}),
        ("tone", {"f0": 1200.0, "harmonics": 2}),
        ("noise", {"fc": 3000.0, "bw": 800.0}),
        ("trill", {"f0": 4500.0, "rate": 18.0}),
        ("chirp", {"f0": 500.0, "f1": 2000.0}),
        ("tone", {"f0": 2600.0, "harmonics": 2}),
        ("noise", {"fc": 7200.0, "bw": 1000.0}),
        ("trill", {"f0": 900.0, "rate": 45.0}),
    ]
    bank = []
    for i in range(num_classes):
        kind, params = base[i % len(base)]
        params = dict(params)
        if i >= len(base):  # shift reruns of the bank in frequency
            for key in ("f0", "f1", "fc"):
                if key in params:
                    params[key] *= 1.0 + 0.31 * (i // len(base))
        bank.append((kind, params))
    return bank


def synth_corpus(out_dir, num_segments, num_classes=3, seed=0,
                 dur_range=(0.10, 0.20), num_speakers=2, valid_every=8,
                 wav_name="syllables.wav", snr_noise=0.02,
                 class_durations=True, jitter=1.0, unique_per_class=None):
    """Generate the corpus; returns (annotation_csv_path, DataFrame).

    Segments cycle through classes (balanced); every `valid_every`-th
    segment goes to the validation split.  Ground truth is the `label`
    column (class name), which both frameworks carry through their
    encode CSVs (reference encode.py:48-55).

    class_durations=True gives each class its own (jittered) duration
    band inside dur_range — syllable length is a real acoustic cue in
    birdsong and feeds the models' offset-prediction loss.

    unique_per_class=n renders only n distinct segments per class and
    makes the remaining annotation rows re-reference those wav regions
    (byte-identical repeats, like the reference's toy corpus where each
    unique segment appears many times).  The ABCD head of this model
    family — in BOTH implementations — only commits to clusters when
    per-class variation is near zero; this is the corpus regime where
    cluster-assignment parity is measurable.
    """
    rng = np.random.default_rng(seed)
    bank = class_bank(num_classes, rng)
    lo, hi = dur_range
    rows, samples = [], []
    cursor = 0.05
    n_unique = (min(unique_per_class * num_classes, num_segments)
                if unique_per_class else num_segments)
    regions = []  # (onset, dur) of each rendered unique segment
    for i in range(num_segments):
        cls = i % num_classes
        if i >= n_unique:  # re-reference an already-rendered region
            onset, offset = regions[i % n_unique]
            rows.append((onset, offset, wav_name,
                         "valid" if i % valid_every == valid_every - 1
                         else "train",
                         "s%d" % (i % num_speakers), "c%02d" % cls))
            continue
        kind, params = bank[cls]
        if class_durations:
            center = lo + (hi - lo) * (cls + 0.5) / num_classes
            half = 0.35 * (hi - lo) / num_classes
            half = half * max(jitter, 0.15)  # keep durations non-constant
            dur = float(rng.uniform(center - half, center + half))
        else:
            dur = float(rng.uniform(lo, hi))
        n = int(dur * FS)
        t = np.arange(n) / FS
        seg = _archetype(kind, params, t, dur, rng, jitter=jitter)
        env = np.clip(np.minimum(t / 0.015, (dur - t) / 0.015), 0.0, 1.0)
        amp = 6000.0 * rng.uniform(1.0 - 0.3 * jitter, 1.0)
        seg = seg / (np.abs(seg).max() + 1e-9) * amp * env
        seg = seg + rng.normal(size=n) * amp * snr_noise
        samples.append(np.clip(seg, -32767, 32767).astype(np.int16))
        regions.append((round(cursor, 4), round(cursor + dur, 4)))
        rows.append((round(cursor, 4), round(cursor + dur, 4), wav_name,
                     "valid" if i % valid_every == valid_every - 1
                     else "train",
                     "s%d" % (i % num_speakers), "c%02d" % cls))
        cursor += dur + 0.02
    wav = np.zeros(int(cursor * FS) + FS, np.int16)
    for (onset, _, _, _, _, _), seg in zip(rows, samples):
        start = int(round(onset * FS))
        wav[start:start + len(seg)] = seg
    os.makedirs(out_dir, exist_ok=True)
    spw.write(os.path.join(out_dir, wav_name), FS, wav)
    df = pd.DataFrame(rows, columns=["onset", "offset", "input_path",
                                     "data_type", "speaker", "label"])
    ann = os.path.join(out_dir, "annotation.csv")
    df.to_csv(ann, index=False)
    return ann, df


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--segments", type=int, default=300)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    ann, df = synth_corpus(args.out_dir, args.segments, args.classes,
                           args.seed)
    print(ann, len(df), "segments,",
          df.data_type.value_counts().to_dict())
