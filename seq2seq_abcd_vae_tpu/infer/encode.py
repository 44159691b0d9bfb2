"""Post-training encoding of datasets.

Reference: the Encoder(Learner) subclasses in ABCD-VAE/encode.py:12-61,
encode_logit.py, encode_features.py and plain/encode.py:12-52.  One module
serves all four: the ``mode`` selects the head, the writers reproduce each
script's CSV layout byte-for-byte:

- mode='probs'    -> long (data_ix, category_ix, prob), streamed appends
- mode='logits'   -> long (data_ix, dimension, logit)
- mode='features' -> long (data_ix, dimension, feature_value)
- mode='params'   -> plain-VAE long (data_ix, parameter_name, feature_dim,
                     parameter_value), written once, sorted

A ``.prev`` backup chain protects existing result files
(encode.py:57-61).
"""

from __future__ import annotations

import functools
import os
import queue
import threading
import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.batching import DataLoader, FrontendSpec, RawBatch
from ..models import abcd as abcd_mod
from ..models import encoder as enc_mod
from ..models import sampler as sampler_mod
from ..ops import stft as stft_ops
from ..train.learner import Learner, StepStatics


def _annotation_suffixes(df_ann: pd.DataFrame) -> dict:
    """Map annotation index -> preformatted ``,cell1,cell2...`` CSV text.

    The fast path splits one ``df.to_csv`` call on physical lines, which
    is only valid when the index is integer (so ``line.split(',', 1)``
    recovers it) and no cell embeds a newline (pandas quotes such cells
    across physical lines).  Otherwise fall back to per-row ``to_csv`` —
    pandas CSV formatting is cell-local, so the per-row output matches
    the reference's melt+merge+to_csv chain byte-for-byte either way.
    """
    cells_safe = not any(
        df_ann[c].astype(str).str.contains("[\r\n]", regex=True).any()
        for c in df_ann.columns)
    if pd.api.types.is_integer_dtype(df_ann.index.dtype) and cells_safe:
        out = {}
        for line in df_ann.to_csv(header=False, index=True).splitlines():
            ix, rest = line.split(",", 1)
            out[int(ix)] = ("," + rest).encode()
        return out
    out = {}
    for ix in df_ann.index:
        row = df_ann.loc[[ix]].to_csv(header=False, index=False)
        if row.endswith("\n"):
            row = row[:-1]
        out[ix] = ("," + row).encode()
    return out


def _format_rows(ixs, values: np.ndarray, suffix: dict,
                 var_cache: dict) -> bytes:
    """Vectorized long-format CSV assembly for one batch.

    Produces the text the reference's melt(+merge).to_csv chain would,
    ordered var-major (all dimension-0 rows, then dimension-1, ...), as
    BYTES — the consumer writes to a binary file handle, because
    TextIOWrapper's utf-8 encode of multi-MB strings was measured at
    half the end-to-end encode wall time (the content is pure ASCII so
    the encode is an identity copy).  The other hot cost is the
    float->shortest-repr conversion, done C-side by numpy's dragon4 via
    ``astype('U16')`` — byte-identical to Python's ``str(np.float32(...))``
    — instead of a Python loop over K*B cells (K=128 made that loop
    dominate end-to-end encode wall time).  ``var_cache`` memoizes the
    per-K ``b"<var>,"`` column across batches.
    """
    n = len(ixs)
    num_vars = values.shape[1]
    # 'U16' covers the longest float32 shortest-repr ('-1.1754944e-38');
    # float64 (plain-VAE params path) needs up to 24.  dragon4 only
    # emits to unicode; the S-cast afterwards is a cheap narrowing copy.
    width = ("U16", "S16") if values.dtype == np.float32 else ("U32", "S32")
    vals = (np.ascontiguousarray(values.T).reshape(-1)
            .astype(width[0]).astype(width[1]))
    pre = np.char.add(
        np.asarray([str(ix).encode() for ix in ixs], dtype="S"), b",")
    var_part = var_cache.get(num_vars)
    if var_part is None:
        var_part = np.char.add(
            np.arange(num_vars).astype("U12").astype("S12"), b",")
        var_cache[num_vars] = var_part
    head = np.char.add(np.tile(pre, num_vars), np.repeat(var_part, n))
    body = np.char.add(head, vals)
    if suffix:
        sfx = np.asarray(
            [suffix[ix] if ix in suffix else suffix[int(ix)]
             for ix in ixs], dtype="S")
        body = np.char.add(body, np.tile(sfx, num_vars))
    return b"\n".join(body.tolist()) + b"\n"


#: adaptive chunking targets per-fetch payload time ~= this multiple of
#: the link's fixed round-trip: big enough that the RTT is amortized to
#: <= 1/(1+_RTT_AMORT) of fetch time, small enough that the prefetch
#: pipeline stays fine-grained (the consumer formats chunk n-1 while
#: chunk n fetches; one giant chunk would serialize the tail).
_RTT_AMORT = 4.0


class _LinkModel:
    """Online estimate of the tunnel's fixed round-trip + bandwidth,
    re-targeting the fetch chunk size as the link drifts (this tunnel
    swings ~1-35 MB/s between sessions and minute-to-minute).

    Fetch time is modeled as ``rtt + bytes/bw``; ``rtt`` starts at the
    observed tunnel floor and only ratchets down (a fetch can never beat
    the true RTT), ``bw`` is an EWMA so drift is tracked without
    thrashing on single outliers."""

    def __init__(self, chunk: int, adaptive: bool):
        self.rtt = 0.35
        self.bw: float | None = None
        self.chunk = chunk
        self.adaptive = adaptive

    def observe(self, dt: float, nbytes: int, nbatches: int) -> None:
        # rtt/bw estimates are always maintained (they feed the encode
        # telemetry / ceiling computation); only the chunk re-targeting
        # is gated on adaptive mode.
        self.rtt = min(self.rtt, dt)
        bw = nbytes / max(dt - self.rtt, 1e-3)
        self.bw = bw if self.bw is None else 0.5 * self.bw + 0.5 * bw
        if not self.adaptive:
            return
        per_batch = max(nbytes // max(nbatches, 1), 1)
        target = _RTT_AMORT * self.rtt * self.bw
        self.chunk = int(min(max(round(target / per_batch), 2), 256))


def _prefetch(gen, depth: int = 64):
    """Run a generator in a worker thread, buffering up to ``depth`` items.

    The encode pipeline's producer side (device dispatch + tunnel fetch,
    `_pipelined`) blocks in C with the GIL released, while the consumer
    side (CSV formatting + file writes) is pure host CPU; running them in
    one thread serializes tunnel latency with formatting.  One-thread
    lookahead overlaps them — the fetch of chunk n proceeds while chunk
    n-1 is being formatted.  Exceptions in the producer re-raise at the
    consumer's next pull."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:  # surfaced at the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True,
                         name="encode-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def rename_existing_file(filepath: str) -> None:
    """Keep a .prev chain instead of overwriting (encode.py:57-61)."""
    if os.path.isfile(filepath):
        new_path = filepath + ".prev"
        rename_existing_file(new_path)
        os.rename(filepath, new_path)


@functools.partial(jax.jit, static_argnames=("statics", "bucket_frames",
                                             "mode"))
def _encode_step(params, audio, num_frames, *, statics: StepStatics,
                 bucket_frames: int, mode: str):
    inputs = stft_ops.log_spectrogram(
        audio, statics.frame_length, statics.step_size, bucket_frames,
        statics.epsilon, statics.normalizer, window=statics.window,
        method=statics.stft_method)
    last_hidden = enc_mod.encoder_apply(params["encoder"],
                                        statics.model.encoder, inputs,
                                        num_frames)
    head = params["feature_sampler"]
    if mode == "features":
        return abcd_mod.abcd_code(head, last_hidden)
    if mode == "params":
        return sampler_mod.sampler_apply(head, last_hidden)
    logits = abcd_mod.abcd_logits(head, last_hidden)
    if mode == "logits":
        return logits
    return jax.nn.softmax(logits, -1)


class Encoder(Learner):
    """Inference-only Learner: loads a checkpoint, freezes, encodes.

    (reference: encode.py:12-20 — skips logging setup entirely)
    """

    def __init__(self, model_config_path: str, device: str = "",
                 matmul_precision: str = "highest",
                 stft_method: str = "fft"):
        if matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              matmul_precision)
        self.stft_method = stft_method
        self.device = self._pick_device(device)
        self.save_dir = os.path.dirname(model_config_path)
        self.retrieve_model(checkpoint_path=model_config_path, device=device)

    def encode_batch(self, batch: RawBatch, statics: StepStatics,
                     mode: str, cache=None):
        out = self._dispatch(batch, statics, mode, cache)
        return self._fetch(batch, out, mode)

    def _dispatch(self, batch: RawBatch, statics: StepStatics, mode: str,
                  cache=None, staged_pos=None):
        """Asynchronously dispatch one encode step (device arrays out)."""
        if cache is not None and batch.pos_sorted is not None:
            audio, num_frames, _ = cache.place(batch, staged_pos)
        else:
            audio, num_frames = batch.audio, batch.num_frames
        out = _encode_step(self.params, audio, num_frames,
                           statics=statics,
                           bucket_frames=batch.bucket_frames, mode=mode)
        # Opt-in fetch compression: the tunnel is the encode bound, and
        # the (N, K) f32 value matrix is the dominant payload (~2 MB/pass
        # at the bench corpus).  SEQ2SEQ_ENCODE_FETCH_DTYPE=bf16 halves
        # it by casting on device and widening back on host.  NOT the
        # default: the CSV text then carries bf16-rounded values, which
        # breaks byte-identity with the reference's f32 melt chain
        # (encode.py:46-55) — a bench/throughput lever, not the contract.
        if (os.environ.get("SEQ2SEQ_ENCODE_FETCH_DTYPE") == "bf16"
                and mode != "params"):
            out = out.astype(jnp.bfloat16)
        return out

    @staticmethod
    def _fetch(batch: RawBatch, out, mode: str):
        n = batch.num_real
        if mode == "params":
            return tuple(np.asarray(p)[:n] for p in out)
        return np.asarray(out)[:n]

    def _pipelined(self, dataloader, statics: StepStatics, mode: str,
                   chunk: int | None = None):
        """Yield (batch, host values) with chunked fetches: every batch
        is dispatched asynchronously, outputs are concatenated ON DEVICE
        per chunk, and one host fetch downloads the whole chunk — each
        fetch pays the tunnel's fixed round-trip (~0.3-0.5 s observed),
        so per-batch fetches bound encode at ~2-3 batches/s regardless
        of compute.

        The chunk size is DRIFT-ADAPTIVE by default (this tunnel's fetch
        bandwidth swings ~1-35 MB/s between sessions): each flush
        measures its own elapsed time and payload, maintains EWMA
        estimates of the link's fixed round-trip and bandwidth, and
        re-targets the next chunk so the payload costs about
        ``_RTT_AMORT``x the round-trip — big enough that the fixed RTT
        is amortized, small enough that the prefetch pipeline keeps the
        consumer (CSV formatting) overlapped with the next fetch.  A
        fixed ``chunk`` argument or ``SEQ2SEQ_ENCODE_CHUNK`` disables
        adaptation (0 = adaptive)."""
        env_chunk = int(os.environ.get("SEQ2SEQ_ENCODE_CHUNK", "0"))
        if chunk is None and env_chunk > 0:
            chunk = env_chunk
        adaptive = chunk is None
        if adaptive:
            chunk = 8  # opening guess; re-targeted after each flush
        # Per-pass link telemetry, published on the Encoder so callers
        # (bench.py) can compute the pass's link-bound throughput ceiling
        # next to the measured number: bytes actually fetched, fetch
        # count (each pays the tunnel's fixed round-trip), cumulative
        # fetch wall, the link model's rtt/bw estimates, and the
        # up-front index-staging wall.  Updated in place as the
        # generator runs; final after the pass completes.
        stats = {"fetched_bytes": 0, "flushes": 0, "fetch_s": 0.0,
                 "stage_s": 0.0, "rtt_est_s": None, "bw_est_Bps": None}
        self.last_encode_stats = stats
        cache = self._cache_for(dataloader)
        if cache is not None:
            dataloader.skip_audio = True
            epoch = list(dataloader)  # index-only batches
            t0 = _time.perf_counter()
            staged = cache.stage_epoch(epoch)  # one transfer up front
            stats["stage_s"] = _time.perf_counter() - t0
            stream = iter(zip(epoch, staged))
        else:
            stream = ((b, None) for b in dataloader)

        batches: list = []
        outs: list = []
        link = _LinkModel(chunk, adaptive)

        def flush():
            if not batches:
                return
            t0 = _time.perf_counter()
            if mode == "params":
                cats = tuple(
                    np.asarray(jnp.concatenate([o[j] for o in outs], 0)
                               if len(outs) > 1 else outs[0][j])
                    for j in range(len(outs[0])))
                rows_of = [o[0].shape[0] for o in outs]
                nbytes = sum(c.nbytes for c in cats)
            else:
                cats = np.asarray(jnp.concatenate(outs, 0)
                                  if len(outs) > 1 else outs[0])
                rows_of = [o.shape[0] for o in outs]
                nbytes = cats.nbytes
                if cats.dtype != np.float32:  # bf16-fetch lever: widen
                    cats = cats.astype(np.float32)
            dt = _time.perf_counter() - t0
            link.observe(dt, nbytes, len(batches))
            stats["fetched_bytes"] += nbytes
            stats["flushes"] += 1
            stats["fetch_s"] += dt
            stats["rtt_est_s"] = link.rtt
            stats["bw_est_Bps"] = link.bw
            off = 0
            for b, rows in zip(batches, rows_of):
                n = b.num_real
                if mode == "params":
                    yield b, tuple(c[off:off + rows][:n] for c in cats)
                else:
                    yield b, cats[off:off + rows][:n]
                off += rows
            batches.clear()
            outs.clear()

        for batch, pos in stream:
            outs.append(self._dispatch(batch, statics, mode, cache, pos))
            batches.append(batch)
            if len(batches) >= link.chunk:
                yield from flush()
        yield from flush()

    # ------------------------------------------------------------------
    def encode_dataset(self, dataset, save_path: str, frontend: FrontendSpec,
                       epsilon: float, normalizer: float, mode: str = "probs",
                       batch_size: int = 1) -> None:
        """Streamed long-format CSV (abcd encode variants,
        encode.py:38-55).

        The row stream is byte-identical to the reference's
        DataFrame.melt(+merge).to_csv chain, but assembled directly
        (precomputed per-segment annotation suffixes + repr-formatted
        float32 values): the pandas chain dominates end-to-end encode
        wall time at K=128 (tests/test_infer_decode.py pins byte
        equality against the pandas formulation)."""
        value_col = {"probs": "prob", "logits": "logit",
                     "features": "feature_value"}[mode]
        var_col = "category_ix" if mode == "probs" else "dimension"
        statics = self._statics(frontend, epsilon, normalizer)
        dataloader = DataLoader(dataset, frontend, batch_size=batch_size,
                                pad_to_batch_size=False)
        rename_existing_file(save_path)
        if "label" in dataset.df_annotation.columns:
            df_ann = dataset.df_annotation.drop(
                columns=["onset_ix", "offset_ix", "length"])
        else:
            df_ann = None
        header = ["data_ix", var_col, value_col]
        suffix = {}
        if df_ann is not None:
            header += [str(c) for c in df_ann.columns]
            # pandas formats the annotation cells; reuse them once per row
            # so merged text matches the melt+merge+to_csv output exactly
            suffix = _annotation_suffixes(df_ann)
        var_cache: dict = {}
        format_s = 0.0  # host CSV assembly/write wall (telemetry)
        with open(save_path, "wb") as f:
            f.write((",".join(header) + "\n").encode())
            for batch, values in _prefetch(
                    self._pipelined(dataloader, statics, mode)):
                t0 = _time.perf_counter()
                f.write(_format_rows(batch.ixs, values, suffix, var_cache))
                format_s += _time.perf_counter() - t0
        if getattr(self, "last_encode_stats", None) is not None:
            self.last_encode_stats["format_s"] = format_s

    def encode_dataset_npz(self, dataset, save_path: str,
                           frontend: FrontendSpec, epsilon: float,
                           normalizer: float, mode: str = "probs",
                           batch_size: int = 1) -> None:
        """Binary sidecar (strict TPU extension, ``--save_format npz``).

        Stores ``data_ix`` (N,) int64 in stream order plus the dense
        value matrix — ``values`` (N, K) for the abcd heads, or
        ``mean``/``log_variance`` (N, F) for the plain-VAE params mode —
        exactly the numbers the CSV writer formats, without the
        float->text round-trip (the CSV's shortest-repr float32 text
        parses back bit-identically, so either artifact reconstructs the
        other)."""
        statics = self._statics(frontend, epsilon, normalizer)
        dataloader = DataLoader(dataset, frontend, batch_size=batch_size,
                                pad_to_batch_size=False)
        rename_existing_file(save_path)
        ix_parts, val_parts = [], []
        for batch, values in _prefetch(
                self._pipelined(dataloader, statics, mode)):
            ix_parts.append(np.asarray(batch.ixs))
            val_parts.append(values)
        ixs = np.concatenate(ix_parts) if ix_parts else np.zeros(0, int)
        if mode == "params":
            names = ["mean", "log_variance"]
            arrs = {n: np.concatenate([p[j] for p in val_parts])
                    if val_parts else np.zeros((0, 0), np.float32)
                    for j, n in enumerate(names)}
        else:
            arrs = {"values": np.concatenate(val_parts) if val_parts
                    else np.zeros((0, 0), np.float32)}
        # a file handle keeps the exact -S path (np.savez appends .npz
        # to extension-less path strings)
        with open(save_path, "wb") as f:
            np.savez(f, data_ix=ixs, mode=np.asarray(mode), **arrs)

    def encode_dataset_params(self, dataset, frontend: FrontendSpec,
                              epsilon: float, normalizer: float,
                              parameter_ix2name: Optional[dict] = None,
                              batch_size: int = 1) -> pd.DataFrame:
        """Plain-VAE parameter dump (plain/encode.py:37-52)."""
        if parameter_ix2name is None:
            parameter_ix2name = {}
        statics = self._statics(frontend, epsilon, normalizer)
        dataloader = DataLoader(dataset, frontend, batch_size=batch_size,
                                pad_to_batch_size=False)
        encoded = []
        for batch, param_tuple in _prefetch(
                self._pipelined(dataloader, statics, "params")):
            for parameter_ix, p in enumerate(param_tuple):
                name = parameter_ix2name.get(parameter_ix, parameter_ix)
                for row_ix, data_ix in enumerate(batch.ixs):
                    encoded += [(data_ix, name, feature_dim, value)
                                for feature_dim, value
                                in enumerate(p[row_ix, :])]
        return pd.DataFrame(encoded, columns=["data_ix", "parameter_name",
                                              "feature_dim",
                                              "parameter_value"])
