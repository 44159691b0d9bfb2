"""Seed-stable parity corpus from REAL audio: hundreds of distinct
augmented variants of the reference toy_data syllables.

Every purely synthetic corpus tried (chirp/noise archetypes, template
replication, jitter sweeps) collapses to a uniform posterior in BOTH
frameworks — the log-spectrograms are too predictable for the latent
class to pay its KL rent.  The one regime where the reference's ABCD
head demonstrably commits is the real birdsong toy segments
(/root/reference/toy_data, PARITY.md section 3).  This generator keeps
that acoustic richness but fixes the judge-noted degeneracy (only 6
unique segments): each of the 6 train syllables (labels A/B/C, speakers
a/b) is expanded into many DISTINCT variants via label-preserving
augmentations:

- gain   x U(0.6, 1.4)         (log-amplitude shift, speaker-like)
- resample factor U(0.95,1.05) (duration + pitch jitter)
- additive noise at <=2% rms   (recording-noise floor)

so the corpus has ``num_segments`` distinct waveforms, 3 classes, and
within-class variation far below between-class variation.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import scipy.io.wavfile as spw

REFERENCE = os.environ.get("REFERENCE_ROOT", "/root/reference")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def toy_data_root() -> str:
    """Reference toy_data when mounted, else the vendored fixture."""
    ref = os.path.join(REFERENCE, "toy_data")
    return ref if os.path.isdir(ref) else os.path.join(REPO, "fixtures",
                                                       "toy_data")


def _load_templates():
    root = toy_data_root()
    csv = [f for f in os.listdir(root) if f.endswith(".csv")][0]
    df = pd.read_csv(os.path.join(root, csv))
    df = df[df.data_type == "train"].reset_index(drop=True)
    fs, wav = spw.read(os.path.join(root, df.input_path.iloc[0]))
    wav = wav.astype(np.float64)
    segs = []
    for _, row in df.iterrows():
        a = int(round(row.onset * fs))
        b = int(round(row.offset * fs))
        segs.append((wav[a:b], str(row.label), str(row.speaker)))
    return fs, segs


def _augment(rng: np.random.Generator, seg: np.ndarray,
             gain_spread: float = 0.4, resample_spread: float = 0.05,
             noise_rms: float = 0.02) -> np.ndarray:
    gain = rng.uniform(1.0 - gain_spread, 1.0 + gain_spread)
    rate = rng.uniform(1.0 - resample_spread, 1.0 + resample_spread)
    n = len(seg)
    m = int(round(n / rate))
    pos = np.linspace(0.0, n - 1.0, m)
    out = np.interp(pos, np.arange(n), seg) * gain
    if noise_rms > 0.0:
        rms = np.sqrt(np.mean(out ** 2)) + 1e-9
        out = out + rng.normal(size=m) * rng.uniform(0.0, noise_rms) * rms
    return out


def toyaug_corpus(out_dir: str, num_segments: int, seed: int = 0,
                  valid_every: int = 10, gain_spread: float = 0.4,
                  resample_spread: float = 0.05, noise_rms: float = 0.02):
    """Returns (annotation_csv_path, dataframe with a `label` column).

    The three augmentation scales are the distinctness dial: all zero
    reproduces the replicated-toy regime (byte-near-identical copies)
    where the ABCD head demonstrably commits; the defaults give fully
    distinct variants.  PARITY.md's dose-response analysis sweeps this.
    """
    rng = np.random.default_rng(seed)
    fs, templates = _load_templates()
    rows, samples = [], []
    cursor = 0.05
    for i in range(num_segments):
        seg, label, speaker = templates[i % len(templates)]
        aug = _augment(rng, seg, gain_spread, resample_spread, noise_rms)
        dur = len(aug) / fs
        rows.append((round(cursor, 6), round(cursor + dur, 6),
                     "toyaug.wav",
                     "valid" if i % valid_every == valid_every - 1
                     else "train", speaker, label))
        samples.append(aug)
        cursor += dur + 0.02
    total = int(cursor * fs) + fs
    wav = np.zeros(total, np.float64)
    for (onset, _, _, _, _, _), s in zip(rows, samples):
        a = int(round(onset * fs))
        wav[a:a + len(s)] = s
    peak = np.max(np.abs(wav)) + 1e-9
    wav = (wav / max(1.0, peak / 32000.0)).astype(np.int16)
    spw.write(os.path.join(out_dir, "toyaug.wav"), fs, wav)
    df = pd.DataFrame(rows, columns=["onset", "offset", "input_path",
                                     "data_type", "speaker", "label"])
    ann = os.path.join(out_dir, "annotation.csv")
    df.to_csv(ann, index=False)
    return ann, df


if __name__ == "__main__":
    import sys
    import tempfile
    out = tempfile.mkdtemp(prefix="toyaug-")
    ann, df = toyaug_corpus(out, int(sys.argv[1]) if len(sys.argv) > 1
                            else 300)
    print(ann)
    print(df.groupby(["label", "data_type"]).size())
