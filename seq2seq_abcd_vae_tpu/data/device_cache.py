"""Device-resident corpus cache: upload once, assemble batches on-device.

The reference streams every batch from host to device (data_utils.py
DataLoader -> cuda tensors per step); round-3 fetch-synced measurements
showed that on this container's tunneled TPU the per-batch host->device
audio copy — not compute — bounds training throughput (the tunnel pays a
~0.5 s fixed cost per transfer and drifts to ~1 MB/s; the device step
itself is ~22-33 ms).  The TPU-native answer is to keep the corpus in
HBM: audio corpora at this model family's scale are tiny next to a v5e's
16 GB (the toy corpus is ~1 MB, the 4096-segment bench corpus ~39 MB as
int16), so the whole dataset is uploaded ONCE and every batch becomes a
device-side gather driven by a (B,) int32 index vector — a ~2 KB
transfer instead of megabytes.

Bit-parity contract with host assembly (data/batching.py make_batch):

- each segment's CENTERED row content ([reflect|x|reflect], audio.py
  center_pad_segment) is precomputed once at build — it depends only on
  the segment, not the bucket — into a fixed-stride (N, S) array whose
  tails are zero (S = longest centered row, 128-lane aligned; whole-row
  gathers move at memory bandwidth where an elementwise index gather
  cost ~20 ms/batch in the round-3 hardware trace);
- a batch gather takes whole rows and statically slices/zero-pads S to
  the bucket's ``buf_len``, reproducing the host-assembled
  ``[content | 0-fill]`` rows exactly;
- ``num_frames``/``speakers`` are gathered from per-segment arrays with
  the padding-row sentinels (0 / -1) applied where ``pos < 0``;
- the flat dtype is int16 iff every segment decodes to int16 (the host
  path's per-batch rule, decided corpus-wide here; int16->f32 conversion
  is exact so mixed corpora still produce identical frontend inputs).

The cache is built per dataset, placed on one device, and used by
Learner._place_batch / infer.encode when enabled (single-process,
no device mesh, corpus under SEQ2SEQ_DEVICE_CACHE_MAX_BYTES).
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from .audio import center_pad_segment
from .batching import FrontendSpec, RawBatch

logger = logging.getLogger(__name__)


def corpus_cache_bytes(dataset, frontend: FrontendSpec) -> int:
    """Upper bound on the (padded 2-D) buffer bytes, assuming f32.

    The cache stores one fixed-stride row per segment (stride = longest
    centered row) rather than a ragged flat buffer: a whole-row gather
    lowers to contiguous per-row dynamic slices the TPU moves at memory
    bandwidth, where an elementwise (B, buf_len) index gather cost
    ~20 ms/batch on hardware (round-3 trace)."""
    pad = frontend.pad if frontend.centering else 0
    if len(dataset) == 0:
        return 0
    stride = int(dataset.lengths_np.max()) + 2 * pad
    return stride * len(dataset) * 4


def _frames_for_lengths(lengths: np.ndarray, fe: FrontendSpec) -> np.ndarray:
    # same formula as DataLoader._frames_for_lengths (batching.py)
    padded = lengths + (2 * fe.pad if fe.centering else 0)
    return np.where(padded >= fe.frame_length,
                    1 + (padded - fe.frame_length) // fe.step_size,
                    0).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("buf_len",))
def _gather_batch(rows, frames, speakers, pos, *, buf_len: int):
    """(B,) dataset positions (-1 = padding row) -> the host-assembly
    triple (audio (B, buf_len), num_frames (B,), speakers (B,)).

    ``rows`` is the (N, S) fixed-stride cache: content beyond each row's
    real samples is already zero, so the whole-row gather only needs a
    row mask for padding positions plus a static slice/zero-pad from S
    to the bucket's buf_len."""
    posc = jnp.maximum(pos, 0)
    audio = rows[posc]  # contiguous whole-row gather
    audio = jnp.where((pos >= 0)[:, None], audio,
                      jnp.zeros((), rows.dtype))
    s = rows.shape[1]
    if buf_len <= s:
        audio = audio[:, :buf_len]
    else:
        audio = jnp.pad(audio, ((0, 0), (0, buf_len - s)))
    num_frames = jnp.where(pos >= 0, frames[posc], 0)
    spk = jnp.where(pos >= 0, speakers[posc], -1)
    return audio, num_frames, spk


@jax.jit
def _split_rows(mat):
    """(n, B) -> n separate (B,) device arrays in ONE dispatch (the
    tunnel's device_put is synchronous at ~RTT per call; per-batch index
    transfers would serialize the host loop at one RTT per batch)."""
    return tuple(mat)


class DeviceCorpusCache:
    """One dataset's centered segments, a fixed-stride 2-D device array."""

    def __init__(self, rows, frames, speakers, frontend: FrontendSpec,
                 device):
        self.rows = rows
        self.frames = frames
        self.speakers = speakers
        self.frontend = frontend
        self.device = device

    @classmethod
    def build(cls, dataset, frontend: FrontendSpec, device):
        """Decode + center every segment once and upload.  Returns None
        when the corpus cannot be cached (a segment too short to
        reflect-pad — the streaming path raises its diagnostic at the
        batch that hits it, preserving the error surface)."""
        if os.environ.get("SEQ2SEQ_DEVICE_CACHE_SYNTH") == "1":
            return cls.build_synthetic(dataset, frontend, device)
        n = len(dataset)
        if n == 0:
            return None
        pad = frontend.pad if frontend.centering else 0
        lengths = dataset.lengths_np
        row_samples = (lengths + 2 * pad).astype(np.int64)
        # 128-lane-aligned stride keeps the row gather layout-friendly
        stride = int(-(-int(row_samples.max()) // 128) * 128)
        segs = [dataset.segment_raw_pos(p) for p in range(n)]
        dtype = (np.int16 if all(s.dtype == np.int16 for s in segs)
                 else np.float32)
        rows = np.zeros((n, stride), dtype)
        try:
            for p, seg in enumerate(segs):
                if seg.dtype != dtype:
                    seg = seg.astype(dtype)
                if frontend.centering:
                    center_pad_segment(seg, pad, rows[p, :row_samples[p]])
                else:
                    rows[p, :len(seg)] = seg
        except ValueError:
            return None
        frames = _frames_for_lengths(lengths, frontend)
        arrs = jax.device_put(
            (rows, frames, dataset.speakers_np.astype(np.int32)), device)
        logger.info(
            "Device-resident corpus cache: {n} segments, {mb:.1f} MB "
            "{dt} on {dev}".format(n=n, mb=rows.nbytes / 1e6,
                                   dt=np.dtype(dtype).name, dev=device))
        return cls(*arrs, frontend, device)

    @classmethod
    def build_synthetic(cls, dataset, frontend: FrontendSpec, device,
                        seed: int = 0):
        """TIMING-ONLY cache build: identical shapes, dtype, stride, and
        zero-tail layout to :meth:`build`, but the row CONTENT is random
        int16 noise generated ON the device — only the (N,) metadata
        rides the tunnel (~KBs) instead of the full corpus (~tens of
        MB).  Audio values never influence step TIME (the compute graph
        is data-independent: STFT, matmuls, masked sums), so bench.py
        uses this under ``SEQ2SEQ_DEVICE_CACHE_SYNTH=1`` to keep the
        round-end benchmark alive on collapsed-uplink tunnel days
        (measured 0.03 MB/s; a 39 MB corpus upload = ~20 min).  Loss
        values and encode CSV contents are garbage by construction —
        never enable this for training or inference runs."""
        n = len(dataset)
        if n == 0:
            return None
        pad = frontend.pad if frontend.centering else 0
        lengths = dataset.lengths_np
        if frontend.centering and int(lengths.min()) <= pad:
            return None  # mirror build(): too short to reflect-pad
        logger.warning(
            "SEQ2SEQ_DEVICE_CACHE_SYNTH=1: corpus cache content is "
            "device-synthesized noise (timing-only; losses/encodings "
            "are meaningless)")
        row_samples = (lengths + 2 * pad).astype(np.int64)
        stride = int(-(-int(row_samples.max()) // 128) * 128)
        frames = _frames_for_lengths(lengths, frontend)
        # same corpus-wide dtype rule as build(); the decode-once file
        # cache makes this one host pass per wav, no upload
        dtype = (np.int16 if all(
            dataset.segment_raw_pos(p).dtype == np.int16
            for p in range(n)) else np.float32)
        row_len_d, frames_d, spk_d = jax.device_put(
            (row_samples.astype(np.int32), frames,
             dataset.speakers_np.astype(np.int32)), device)

        @jax.jit
        def synth(row_len):
            key = jax.random.PRNGKey(seed)
            if dtype == np.int16:
                noise = jax.random.randint(
                    key, (n, stride), -(1 << 14), 1 << 14,
                    jnp.int32).astype(jnp.int16)
            else:
                noise = jax.random.uniform(
                    key, (n, stride), jnp.float32, -0.5, 0.5)
            mask = (jnp.arange(stride, dtype=jnp.int32)[None, :]
                    < row_len[:, None])
            return jnp.where(mask, noise, jnp.zeros((), noise.dtype))

        rows = synth(row_len_d)
        logger.info(
            "Device-resident corpus cache (SYNTHETIC): {n} segments, "
            "{mb:.1f} MB {dt} on {dev}".format(
                n=n, mb=rows.nbytes / 1e6, dt=np.dtype(dtype).name,
                dev=device))
        return cls(rows, frames_d, spk_d, frontend, device)

    def place(self, batch: RawBatch, staged_pos=None):
        """The device-side equivalent of transferring the host batch:
        returns (audio, num_frames, speakers) on ``self.device``.
        ``staged_pos`` (from :meth:`stage_epoch`) skips the per-batch
        index transfer."""
        pos = (staged_pos if staged_pos is not None
               else jax.device_put(batch.pos_sorted, self.device))
        buf_len = self.frontend.buffer_len(batch.bucket_frames)
        return _gather_batch(self.rows, self.frames, self.speakers, pos,
                             buf_len=buf_len)

    def stage_epoch(self, batches):
        """Upload ALL batches' index vectors in one transfer per row
        length and split them on device: zero per-batch host->device
        traffic for the epoch.  Returns one (B,) device array per batch
        (row counts are grouped so the final partial batch keeps its true
        size — identical RNG draws and jit keys to per-batch placement)."""
        pos_list = [b.pos_sorted for b in batches]
        by_len: dict = {}
        for i, p in enumerate(pos_list):
            by_len.setdefault(len(p), []).append(i)
        out = [None] * len(pos_list)
        for _, idxs in by_len.items():
            if len(idxs) == 1:
                out[idxs[0]] = jax.device_put(pos_list[idxs[0]],
                                              self.device)
                continue
            mat = jax.device_put(
                np.stack([pos_list[i] for i in idxs]), self.device)
            for i, row in zip(idxs, _split_rows(mat)):
                out[i] = row
        return out
