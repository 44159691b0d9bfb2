"""Wav reading with per-file caching, segment extraction, host-side
reflection centering.

Fixes the reference's I/O hot spot: Dataset.__getitem__ re-reads the whole
wav from disk for every segment (ABCD-VAE/modules/data_utils.py:88-94);
here each file is decoded once and segments are numpy slices.  A compiled
C++ reader (``native/``) can be plugged into WavCache when built; the
scipy path is the default.

"Centering" = the reflect padding torch.stft(center=True) applies
(data_utils.py:131-135).  Row lengths differ inside a padded batch, so the
reflection is materialized on the host into each row's scratch area; the
device frontend then does pure static-shaped framing (ops/stft.py).
"""

from __future__ import annotations

import os.path

import numpy as np
import pandas as pd
import scipy.io.wavfile as spw


class WavCache:
    """Decode each wav once; hand out float32 channel views.

    Uses the native C++ reader (seq2seq_abcd_vae_tpu.native) when built,
    scipy otherwise — identical output either way.
    """

    def __init__(self, input_root: str, use_native: bool = True):
        self.input_root = input_root
        self.use_native = use_native
        self._cache: dict[tuple[str, int], np.ndarray] = {}
        self._fs: dict[str, int] = {}

    def read(self, input_path: str, channel: int = 0) -> np.ndarray:
        key = (input_path, channel)
        if key not in self._cache:
            full = os.path.join(self.input_root, input_path)
            data = None
            if self.use_native:
                from .. import native
                got = native.read_wav(full, channel)
                if got is not None:
                    self._fs[input_path], data = got
            if data is None:
                fs, data = spw.read(full)
                if data.ndim > 1:
                    # one channel only (data_utils.py:92-93)
                    data = data[:, channel]
                self._fs[input_path] = fs
                # PCM16 stays int16 (half the host->device bytes; the
                # device frontend casts to f32 exactly). Other formats
                # normalize to float32.
                dtype = np.int16 if data.dtype == np.int16 else np.float32
                data = np.ascontiguousarray(data, dtype=dtype)
            self._cache[key] = data
        return self._cache[key]

    def sample_freq(self, input_path: str) -> int:
        if input_path not in self._fs:
            self.read(input_path)
        return self._fs[input_path]


def segment_sample_bounds(onset_sec, offset_sec, fs):
    """Seconds -> sample indices with pandas/numpy round-half-even
    (data_utils.py:69-79)."""
    onset_ix = np.round(np.asarray(onset_sec, np.float64) * fs).astype(int)
    offset_ix = np.round(np.asarray(offset_sec, np.float64) * fs).astype(int)
    return onset_ix, offset_ix


def center_pad_segment(x: np.ndarray, pad: int, out: np.ndarray) -> None:
    """Write [reflect(pad) | x | reflect(pad)] into out[:len(x)+2*pad].

    Reflection parity with torch reflect padding: left mirrors x[1..pad],
    right mirrors x[-2..-(pad+1)].
    """
    l = x.shape[0]
    if l <= pad:
        raise ValueError(
            f"segment of {l} samples is too short to reflect-pad by {pad}; "
            "use --fft_no_centering or longer segments")
    out[:pad] = x[pad:0:-1]
    out[pad:pad + l] = x
    stop = l - 2 - pad
    out[pad + l: 2 * pad + l] = x[l - 2: (None if stop < 0 else stop):-1]


class SegmentDataset:
    """Variable-length audio segments from an annotation DataFrame.

    Reference: Dataset, data_utils.py:60-103.  Segment bounds are computed
    once up-front; raw samples come from the shared WavCache.
    """

    def __init__(self, df_annotation: pd.DataFrame, wav_cache: WavCache,
                 channel: int = 0, speaker2ix: dict | None = None):
        self.df_annotation = df_annotation
        self.wav_cache = wav_cache
        self.channel = channel
        self.speaker2ix = speaker2ix
        self._compute_bounds()

    def _compute_bounds(self) -> None:
        df = self.df_annotation
        ref_fs = None
        for input_path, sub_df in df.groupby("input_path"):
            fs = self.wav_cache.sample_freq(input_path)
            if ref_fs is None:
                ref_fs = fs
            elif fs != ref_fs:
                # The whole pipeline (STFT geometry, model input_size)
                # assumes one fs (reference data_utils.py:53-57 just uses
                # the first file's) — make the mismatch loud.
                import warnings
                warnings.warn(
                    f"{input_path} has fs={fs} but the corpus was set up "
                    f"for fs={ref_fs}; STFT geometry will be wrong for "
                    "this file", stacklevel=2)
            onset_ix, offset_ix = segment_sample_bounds(
                sub_df.onset.to_numpy(), sub_df.offset.to_numpy(), fs)
            df.loc[sub_df.index, "onset_ix"] = onset_ix
            df.loc[sub_df.index, "offset_ix"] = offset_ix
        df.loc[:, "onset_ix"] = df.loc[:, "onset_ix"].astype(int)
        df.loc[:, "offset_ix"] = df.loc[:, "offset_ix"].astype(int)
        df.loc[:, "length"] = df.loc[:, "offset_ix"] - df.loc[:, "onset_ix"]
        # Flat numpy views for the batch-assembly hot loop — per-row
        # pandas .loc access is far too slow at batch 512 on one core.
        self.index_labels = df.index.to_numpy()
        self.onsets_np = df["onset_ix"].to_numpy(np.int64)
        self.offsets_np = df["offset_ix"].to_numpy(np.int64)
        self.lengths_np = df["length"].to_numpy(np.int64)
        self.paths = df["input_path"].tolist()
        if self.speaker2ix is None:
            self.speakers_np = np.full(len(df), -1, np.int32)
        else:
            self.speakers_np = np.asarray(
                [self.speaker2ix[s] for s in df["speaker"]], np.int32)

    def segment_raw_pos(self, pos: int) -> np.ndarray:
        """Raw samples by *positional* index (hot path)."""
        wav = self.wav_cache.read(self.paths[pos], self.channel)
        return wav[self.onsets_np[pos]:self.offsets_np[pos]]

    def __len__(self) -> int:
        return self.df_annotation.shape[0]

    def sort_indices_by_length(self, ixs) -> pd.Index:
        """Length-descending order within a batch (data_utils.py:81-82)."""
        return self.df_annotation.iloc[ixs, :].sort_values(
            "length", ascending=False).index

    def segment_raw(self, ix) -> np.ndarray:
        """Raw float32 samples of segment ``ix`` (pandas label index)."""
        row = self.df_annotation.loc[ix]
        wav = self.wav_cache.read(row["input_path"], self.channel)
        return wav[int(row["onset_ix"]):int(row["offset_ix"])]

    def speaker_id(self, ix) -> int:
        """Int speaker id, or -1 when the annotation has no speaker column
        (the reference uses NaN, data_utils.py:96-99)."""
        if self.speaker2ix is None:
            return -1
        return self.speaker2ix[self.df_annotation.loc[ix, "speaker"]]

    def sample_lengths(self) -> np.ndarray:
        return self.df_annotation["length"].to_numpy()
