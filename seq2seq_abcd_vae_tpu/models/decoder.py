"""Autoregressive variational decoder as a single ``lax.scan``.

Reference: RNN_Variational_Decoder, ABCD-VAE/modules/model.py:84-284.
Semantics reproduced over padded/masked batches:

- latent (+ optional speaker embedding) -> initial (h, c) via a Linear;
  the LSTM state is the torch interleave hidden.view(B,H,2) -> h=[...,0],
  c=[...,1] (model.py:100,169-170,262-266);
- first input is zeros; afterwards the *sampled* emission (not the mean)
  is fed back (model.py:174,177-183); per-step input dropout is active
  only in training mode, and --greedy_decoder == input_dropout 1.0
  (model.py:94-95,290,297-299);
- losses are unnormalized sums over valid timesteps: -log_pdf of the
  ground truth under the emission params, plus sum-reduced BCE-with-logits
  on end-of-sequence flags (model.py:122,187-196);
- the offset head runs on the stacked per-step hidden states *after* the
  scan — one large MXU matmul, as in the reference (model.py:191);
- optional bidirectional decoder: a second scan consuming positions
  right-to-left (short rows join late, matching the packed reverse loop,
  model.py:215-237), directional sum-losses mixed by logsumexp with log
  weights (model.py:244-250).  NOTE the reference's bidirectional offset
  loss crashes (it passes the emission-params tuple to BCE, model.py:258);
  we implement the evident intent: logsumexp over the two directional BCE
  sums.

The time axis is the bucket max-T; masking freezes finished rows, which
is exactly the packed "shrinking batch" computation (model.py:175-177).

Hot-loop structure (the sequential scan is bound by the COUNT of small
matmuls, not FLOPs): the emission MLP's first layer is fused into the
recurrent matmul and software-pipelined one step late — scan step s
computes em(h_{s-1}) only to sample the feedback input — so the body runs
3 sequential matmuls (fused h-projection, emission lin2, feedback x
projection) instead of 4; loss-bearing emission parameters and emitted
samples are recomputed post-scan from the stacked hidden states as large
(B*T)-row MXU matmuls using the same presampled noise.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import distributions as dist
from ..configs import DecoderConfig
from . import esn as esn_mod
from . import initializers as init
from . import mlp as mlp_mod
from . import rnn as rnn_mod
from . import sampler as sampler_mod


class DecoderOutput(NamedTuple):
    emission_loss: Optional[jax.Array]  # scalar sum over valid steps
    offset_loss: Optional[jax.Array]    # scalar sum over valid steps
    out: jax.Array                      # (B, T, F) sampled emissions
    emission_params: tuple              # tuple of (B, T, F)
    offset_weights: jax.Array           # (B, T) pre-sigmoid logits
    out_reverse: Optional[jax.Array] = None
    emission_params_reverse: Optional[tuple] = None
    offset_weights_reverse: Optional[jax.Array] = None


def decoder_init(key: jax.Array, cfg: DecoderConfig) -> dict:
    keys = jax.random.split(key, 8)
    feat = cfg.feature_size
    if cfg.has_speaker_embedding:
        feat += cfg.speaker_embed_dim
    params = {
        "feature2hidden": init.linear_params(keys[0], feat,
                                             cfg.hidden_size_total),
        "rnn_cell": _cell_init(keys[1], cfg),
        "emission_sampler": sampler_mod.sampler_init(
            keys[2], _emission_cfg(cfg)),
        "offset_predictor": mlp_mod.mlp_init(keys[3], cfg.rnn_hidden_size,
                                             cfg.mlp_hidden_size, 1),
    }
    if cfg.has_speaker_embedding:
        params["embed_speaker"] = init.normal_params(
            keys[4], (cfg.num_speakers, cfg.speaker_embed_dim))
    if cfg.bidirectional:
        params["rnn_cell_reverse"] = _cell_init(keys[5], cfg)
        params["emission_sampler_reverse"] = sampler_mod.sampler_init(
            keys[6], _emission_cfg(cfg))
        params["offset_predictor_reverse"] = mlp_mod.mlp_init(
            keys[7], cfg.rnn_hidden_size, cfg.mlp_hidden_size, 1)
    return params


def _emission_cfg(cfg: DecoderConfig):
    from ..configs import GaussianSamplerConfig
    return GaussianSamplerConfig(cfg.rnn_hidden_size, cfg.mlp_hidden_size,
                                 cfg.output_size, cfg.emission_distr_name)


def _cell_init(key: jax.Array, cfg: DecoderConfig) -> dict:
    if cfg.rnn_type == "ESN":
        return esn_mod.esn_layer_init(key, cfg.output_size,
                                      cfg.rnn_hidden_size)
    return init.rnn_gate_params(key, cfg.output_size, cfg.rnn_hidden_size,
                                rnn_mod.NUM_GATES[cfg.rnn_type])


def _split_hidden(cfg: DecoderConfig, hidden: jax.Array):
    """Torch-interleave split of the initial state (model.py:100-105)."""
    b = hidden.shape[0]
    if cfg.rnn_type == "LSTM":
        hc = hidden.reshape(b, cfg.rnn_hidden_size, 2)
        return hc[..., 0], hc[..., 1]
    h = hidden.reshape(b, cfg.rnn_hidden_size)
    return h, jnp.zeros_like(h)


def _fused_recurrent_weight(cfg: DecoderConfig, cell_params: dict,
                            emission_params: dict):
    """Concatenate the cell's recurrent weight with the emission MLP's
    first layer: ONE (B,H)x(H, gates*H + k*mlp) product per scan step
    computes both the recurrent gate pre-activations and the (pipelined)
    emission hidden of the PREVIOUS step — the decoder hot loop is bound
    by the count of small sequential matmuls, not FLOPs (reference hot
    loop: model.py:165-196).

    Returns (w_cat (H, G+k*mlp), gate_width G, k, mlp_width).
    """
    w1 = emission_params["to_parameters"]["lin1"]["w"]  # (k, H, mlp)
    k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(h_in, k * m)
    w_hh = cell_params["w_hh"]
    return jnp.concatenate([w_hh, w1_flat], axis=1), w_hh.shape[1], k, m


def _gate_activations(cfg: DecoderConfig, cell_params: dict,
                      x: jax.Array | None, hp: jax.Array, h: jax.Array,
                      c: jax.Array):
    """Cell nonlinearity given the precomputed recurrent projection hp
    (= h @ w_hh, bias NOT yet added).  x is the (gated) feedback input;
    None means exactly-zero input (greedy training), skipping the x@w_ih
    matmul."""
    if cfg.rnn_type == "ESN":  # no biases (model.py:488)
        inp = 0.0 if x is None else x @ cell_params["w_ih"]
        h2 = ((1.0 - cfg.esn_leak) * h
              + cfg.esn_leak * jnp.tanh(inp + hp))
        return h2, c
    xp = (cell_params["b_ih"] if x is None
          else x @ cell_params["w_ih"] + cell_params["b_ih"])
    hp = hp + cell_params["b_hh"]
    if cfg.rnn_type == "LSTM":
        i, f, g, o = jnp.split(xp + hp, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2
    if cfg.rnn_type == "GRU":
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        return (1.0 - z) * jnp.tanh(xn + r * hn) + z * h, c
    return jnp.tanh(xp + hp), c


def _drop_mask(cfg: DecoderConfig, key: jax.Array, shape, dtype,
               deterministic: bool):
    if deterministic or cfg.input_dropout <= 0.0:
        return None
    if cfg.input_dropout >= 1.0:  # --greedy_decoder (model.py:94-95)
        return jnp.zeros(shape, dtype)
    keep = jax.random.bernoulli(key, 1.0 - cfg.input_dropout, shape)
    return keep.astype(dtype) / (1.0 - cfg.input_dropout)


def _run_direction(cfg: DecoderConfig, cell_params: dict,
                   emission_params: dict, h0: jax.Array, c0: jax.Array,
                   step_mask: jax.Array, key: jax.Array,
                   deterministic: bool, emission_mode: str,
                   mask_is_prefix: bool = True):
    """One decoding direction over scan steps 0..T-1.

    step_mask: (B, T) validity *in scan-step order* (flip it along time for
    the reverse direction).  A row's input is gated to zero on its first
    active step (zero first input, model.py:174,218) and to the previous
    sample afterwards.

    mask_is_prefix: True when step_mask rows are contiguous [0, len)
    prefixes (every unidirectional call; the FORWARD leg of the
    bidirectional ESN decoder).  The reverse bidirectional leg passes a
    flipped — suffix — mask and must say False: the Pallas kernels
    synthesize PREFIX masks from row lengths in-kernel, so they are only
    admissible here when the prefix reconstruction is faithful.

    Software-pipelined emission: scan step s computes the emission of the
    hidden state produced at step s-1 (needed only to SAMPLE the feedback
    input) fused into the recurrent matmul, so the loop body has 3
    sequential matmuls instead of 4; the emission parameters used by the
    loss — and the emitted samples — are recomputed AFTER the scan from
    the stacked hidden states as two large MXU matmuls over (B*T) rows,
    with the same presampled noise, so they equal the in-scan values.

    Returns stacked (B, T, .) arrays in scan-step order.
    """
    b, t = step_mask.shape
    f = cfg.output_size
    d = dist.choose_distribution(cfg.emission_distr_name)

    mask_t = jnp.swapaxes(step_mask, 0, 1)[..., None]  # (T, B, 1)
    prev_mask_t = jnp.concatenate(
        [jnp.zeros_like(mask_t[:1]), mask_t[:-1]], axis=0)

    # All randomness is presampled in two bulk RNG calls: per-step
    # jax.random inside lax.scan (split + threefry each iteration) costs
    # more than the cell matmuls at these sizes.
    k_noise, k_drop = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, b, f), h0.dtype)
    drop_t = _drop_mask(cfg, k_drop, (t, b, f), h0.dtype, deterministic)

    if not deterministic and cfg.input_dropout >= 1.0:
        # --greedy_decoder training: the feedback input is exactly zero
        # at every step, so the in-scan emission pipeline is dead code —
        # the body reduces to ONE small sequential matmul (h @ w_hh).
        # Emission params/samples still come from the post-scan batched
        # recompute below, with the identical presampled noise.
        def greedy_step(carry, mt):
            h, c = carry
            hp = h @ cell_params["w_hh"]
            h2, c2 = _gate_activations(cfg, cell_params, None, hp, h, c)
            h = jnp.where(mt, h2, h)
            c = jnp.where(mt, c2, c)
            return (h, c), h2

        _, rnn_out = jax.lax.scan(greedy_step, (h0, c0), mask_t,
                                  unroll=rnn_mod.SCAN_UNROLL)
        rnn_out = jnp.swapaxes(rnn_out, 0, 1)
        em_params = sampler_mod.sampler_apply(emission_params, rnn_out)
        if emission_mode == "mean":
            out = em_params[0]
        else:
            out = d.from_noise(jnp.swapaxes(noise_t, 0, 1), *em_params)
        return rnn_out, em_params, out

    if (cfg.rnn_type in ("LSTM", "GRU", "RNN", "ESN")
            and (cfg.rnn_type != "ESN" or esn_mod.kernels_enabled())
            and emission_mode == "sample"
            and mask_is_prefix
            and drop_t is None
            and cfg.emission_distr_name == "isotropic_gaussian"
            and rnn_mod.resolved_backend() == "pallas"):
        # Fused Pallas kernel: the WHOLE sampling time loop as one
        # program, weights resident in VMEM (ops/decoder_pallas.py).
        em = emission_params["to_parameters"]
        w1 = em["lin1"]["w"]
        if w1.shape[0] == 2:
            from ..ops import decoder_pallas
            # row lengths, recovered from the (contiguous-prefix) step
            # mask by a trivial reduce; the kernels synthesize per-step
            # masks from these in-kernel, so the (T,B,1) mask_t /
            # prev_mask_t built above are dead code on this branch (XLA
            # DCEs them) and nothing mask-shaped reaches the device
            lengths_row = jnp.sum(step_mask.astype(jnp.float32), axis=1)
            w1_flat = jnp.moveaxis(w1, 0, 1).reshape(w1.shape[1], -1)
            w_cat2 = jnp.concatenate([cell_params["w_hh"], w1_flat],
                                     axis=1)
            if cfg.rnn_type == "LSTM":
                outs, mean_s, logvar_s = decoder_pallas.decoder_loop(
                    noise_t, lengths_row, w_cat2,
                    cell_params["b_ih"] + cell_params["b_hh"],
                    em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
                    em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
                    cell_params["w_ih"], h0, c0,
                    interpret=jax.default_backend() != "tpu",
                    precision=rnn_mod.kernel_precision())
                rnn_out = jnp.swapaxes(outs, 0, 1).astype(h0.dtype)
                # The kernel emits POSITION-indexed streams (slot p =
                # the scan path's position-p emission wherever
                # mask_p=1, written there by the kernel's output index
                # map — no downstream (T,B,F) shift); only slot T-1
                # needs the final position's emission, computed from
                # h2_{T-1} (one timestep, autodiff'd) instead of
                # re-running the emission MLP over all B*T rows — the
                # round-3 device trace priced that recompute (and its
                # relayout copies) at ~9 ms/step.
                last = sampler_mod.sampler_apply(emission_params,
                                                 outs[-1])
                em_params = tuple(
                    jnp.swapaxes(p_s.at[-1].set(p_last), 0, 1)
                    for p_s, p_last in zip((mean_s, logvar_s), last))
                out = d.from_noise(jnp.swapaxes(noise_t, 0, 1),
                                   *em_params)
                return rnn_out, em_params, out
            elif cfg.rnn_type == "GRU":  # biases stay separate
                # (candidate-gate reset product includes b_hh; torch
                # GRUCell semantics)
                outs = decoder_pallas.gru_decoder_loop(
                    noise_t, lengths_row, w_cat2,
                    cell_params["b_ih"], cell_params["b_hh"],
                    em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
                    em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
                    cell_params["w_ih"], h0,
                    interpret=jax.default_backend() != "tpu",
                    precision=rnn_mod.kernel_precision())
            elif cfg.rnn_type == "ESN":
                # leaky-tanh Elman kernel, no biases (model.py:444,
                # 529-531); reservoir weights already stop_gradient'd
                # by decoder_apply
                outs = decoder_pallas.rnn_decoder_loop(
                    noise_t, lengths_row, w_cat2,
                    jnp.zeros((cfg.rnn_hidden_size,), h0.dtype),
                    em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
                    em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
                    cell_params["w_ih"], h0,
                    interpret=jax.default_backend() != "tpu",
                    precision=rnn_mod.kernel_precision(),
                    leak=cfg.esn_leak)
            else:  # Elman RNN: biases simply add (torch RNNCell)
                outs = decoder_pallas.rnn_decoder_loop(
                    noise_t, lengths_row, w_cat2,
                    cell_params["b_ih"] + cell_params["b_hh"],
                    em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
                    em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
                    cell_params["w_ih"], h0,
                    interpret=jax.default_backend() != "tpu",
                    precision=rnn_mod.kernel_precision())
            rnn_out = jnp.swapaxes(outs, 0, 1).astype(h0.dtype)
            em_params = sampler_mod.sampler_apply(emission_params,
                                                  rnn_out)
            out = d.from_noise(jnp.swapaxes(noise_t, 0, 1), *em_params)
            return rnn_out, em_params, out

    # step s consumes the noise that sampled position s-1's emission
    # (the kernels above do this shift with a BlockSpec index map instead)
    noise_prev_t = jnp.concatenate(
        [jnp.zeros_like(noise_t[:1]), noise_t[:-1]], axis=0)
    w_cat, gate_w, k, m = _fused_recurrent_weight(cfg, cell_params,
                                                  emission_params)
    b1 = emission_params["to_parameters"]["lin1"]["b"]  # (k, m)
    w2 = emission_params["to_parameters"]["lin2"]["w"]  # (k, m, F)
    b2 = emission_params["to_parameters"]["lin2"]["b"]  # (k, F)

    def step(carry, inp):
        h, c = carry
        if drop_t is None:
            mt, pmt, eps_prev = inp
        else:
            mt, pmt, eps_prev, dmask = inp
        big = h @ w_cat                     # (B, G + k*m): ONE matmul
        hp = big[:, :gate_w]
        emh = jnp.tanh(big[:, gate_w:].reshape(-1, k, m) + b1)
        em_prev = jnp.einsum("bkm,kmf->kbf", emh, w2) + b2[:, None, :]
        if emission_mode == "mean":
            x = em_prev[0]  # sampler2mean(mean_ix=0), model.py:272-284
        else:
            x = d.from_noise(eps_prev, *tuple(em_prev))
        x = jnp.where(pmt, x, 0.0)
        if drop_t is not None:
            x = x * dmask
        h2, c2 = _gate_activations(cfg, cell_params, x, hp, h, c)
        h = jnp.where(mt, h2, h)
        c = jnp.where(mt, c2, c)
        return (h, c), h2

    xs = ((mask_t, prev_mask_t, noise_prev_t) if drop_t is None
          else (mask_t, prev_mask_t, noise_prev_t, drop_t))
    _, rnn_out = jax.lax.scan(step, (h0, c0), xs,
                              unroll=rnn_mod.SCAN_UNROLL)
    rnn_out = jnp.swapaxes(rnn_out, 0, 1)   # (B, T, H)
    # loss-bearing emission params + emitted samples: batched over B*T
    em_params = sampler_mod.sampler_apply(emission_params, rnn_out)
    if emission_mode == "mean":
        out = em_params[0]
    else:
        out = d.from_noise(jnp.swapaxes(noise_t, 0, 1), *em_params)
    return rnn_out, em_params, out


def _run_direction_fused_nll(cfg: DecoderConfig, cell_params: dict,
                             emission_params: dict, h0: jax.Array,
                             c0: jax.Array, step_mask: jax.Array,
                             key: jax.Array,
                             ground_truth_out: jax.Array):
    """Training fast path: the LSTM decoder loop with the Gaussian
    emission NLL accumulated in-kernel
    (ops/decoder_pallas.py:decoder_loop_fused_nll) — the (T, B, F)
    mean/logvar streams, the XLA-side masked log-pdf + adjoint over
    them, and the .at[-1].set overwrites never materialize.  Noise key
    flow is identical to _run_direction, so the randomness (and hence
    the trajectory, up to loss summation order) matches the stream
    path.

    Returns (outs (T, B, H) pre-mask candidates, nll scalar covering
    positions 0..T-2); the caller adds position T-1's term from the
    final carry.
    """
    from ..ops import decoder_pallas
    b, t = step_mask.shape
    f = cfg.output_size
    d = dist.choose_distribution(cfg.emission_distr_name)
    k_noise, _ = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, b, f), h0.dtype)
    lengths_row = jnp.sum(step_mask.astype(jnp.float32), axis=1)
    em = emission_params["to_parameters"]
    w1 = em["lin1"]["w"]
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(w1.shape[1], -1)
    w_cat2 = jnp.concatenate([cell_params["w_hh"], w1_flat], axis=1)
    targets = jnp.swapaxes(ground_truth_out, 0, 1)
    return decoder_pallas.decoder_loop_fused_nll(
        noise_t, lengths_row, w_cat2,
        cell_params["b_ih"] + cell_params["b_hh"],
        em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
        em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
        cell_params["w_ih"], targets, h0, c0,
        interpret=jax.default_backend() != "tpu",
        precision=rnn_mod.kernel_precision())


def _run_direction_fused_losses(cfg: DecoderConfig, cell_params: dict,
                                emission_params: dict,
                                offset_params: dict, h0: jax.Array,
                                c0: jax.Array, step_mask: jax.Array,
                                key: jax.Array,
                                ground_truth_out: jax.Array):
    """Training fast path with BOTH losses fused in-kernel
    (ops/decoder_pallas.py:decoder_loop_fused_losses): emission NLL from
    streamed targets AND the offset-MLP BCE whose (t == len-1) target is
    synthesized from row lengths.  Neither the (T, B, F) emission
    streams nor the (T, B, H) outs stream materialize.  Noise key flow
    is identical to _run_direction.

    Returns (out_last (B, H) final-step pre-mask h2, nll covering
    positions 0..T-2, bce covering all positions); the caller adds
    position T-1's emission term from out_last.
    """
    from ..ops import decoder_pallas
    b, t = step_mask.shape
    f = cfg.output_size
    d = dist.choose_distribution(cfg.emission_distr_name)
    k_noise, _ = jax.random.split(key)
    if (os.environ.get("SEQ2SEQ_KERNEL_RNG", "0") == "1"
            and jax.default_backend() == "tpu"):
        # in-kernel RNG: a (1,1) f32 seed replaces the (T,B,F) noise
        # stream (ops/decoder_pallas.py:_kernel_noise — forks the RNG
        # stream from scan/stream paths, like SEQ2SEQ_FAST_RNG)
        noise_t = jax.random.randint(k_noise, (1, 1), 0,
                                     1 << 24).astype(jnp.float32)
    else:
        noise_t = d.noise(k_noise, (t, b, f), h0.dtype)
    lengths_row = jnp.sum(step_mask.astype(jnp.float32), axis=1)
    em = emission_params["to_parameters"]
    w1 = em["lin1"]["w"]
    w1_flat = jnp.moveaxis(w1, 0, 1).reshape(w1.shape[1], -1)
    w_cat2 = jnp.concatenate([cell_params["w_hh"], w1_flat], axis=1)
    targets = jnp.swapaxes(ground_truth_out, 0, 1)
    emission_args = (em["lin1"]["b"].reshape(-1), em["lin2"]["w"][0],
                     em["lin2"]["w"][1], em["lin2"]["b"].reshape(-1),
                     cell_params["w_ih"], targets,
                     offset_params["lin1"]["w"],
                     offset_params["lin1"]["b"].reshape(1, -1),
                     offset_params["lin2"]["w"].reshape(1, -1),
                     offset_params["lin2"]["b"].reshape(1, 1))
    interpret = jax.default_backend() != "tpu"
    precision = rnn_mod.kernel_precision()
    if cfg.rnn_type == "GRU":
        return decoder_pallas.gru_decoder_loop_fused_losses(
            noise_t, lengths_row, w_cat2, cell_params["b_ih"],
            cell_params["b_hh"], *emission_args, h0,
            interpret=interpret, precision=precision)
    if cfg.rnn_type == "RNN":
        return decoder_pallas.rnn_decoder_loop_fused_losses(
            noise_t, lengths_row, w_cat2,
            cell_params["b_ih"] + cell_params["b_hh"],
            *emission_args, h0,
            interpret=interpret, precision=precision)
    if cfg.rnn_type == "ESN":
        # leaky-tanh Elman kernel, no biases (model.py:444,529-531);
        # reservoir weights already stop_gradient'd by decoder_apply
        return decoder_pallas.rnn_decoder_loop_fused_losses(
            noise_t, lengths_row, w_cat2,
            jnp.zeros((cfg.rnn_hidden_size,), h0.dtype),
            *emission_args, h0,
            interpret=interpret, precision=precision,
            leak=cfg.esn_leak)
    return decoder_pallas.decoder_loop_fused_losses(
        noise_t, lengths_row, w_cat2,
        cell_params["b_ih"] + cell_params["b_hh"],
        *emission_args, h0, c0,
        interpret=interpret, precision=precision)


def _stack_params(a: dict, b: dict) -> dict:
    return jax.tree_util.tree_map(lambda x, y: jnp.stack([x, y]), a, b)


def _run_both_directions(cfg: DecoderConfig, params: dict,
                         h0: jax.Array, c0: jax.Array, h0r: jax.Array,
                         c0r: jax.Array, mask: jax.Array, key: jax.Array,
                         deterministic: bool, emission_mode: str):
    """Both decoding directions in ONE scan (carry stacked on a leading
    axis of size 2, like rnn.run_rnn_layer_bidir) — two sequential scans
    would serialize on a TPU core.  Direction 1 consumes flipped
    masks/noise; its stacked outputs are flipped back to position-major by
    the caller.  Same software-pipelined fused emission as _run_direction.
    Only for LSTM/GRU/RNN cells (ESN uses the two-scan path).
    """
    b, t = mask.shape
    f = cfg.output_size
    d = dist.choose_distribution(cfg.emission_distr_name)

    cell = _stack_params(params["rnn_cell"], params["rnn_cell_reverse"])
    emission = _stack_params(
        params["emission_sampler"]["to_parameters"],
        params["emission_sampler_reverse"]["to_parameters"])

    mask_f = jnp.swapaxes(mask, 0, 1)[:, None, :, None]      # (T,1,B,1)
    mask_t = jnp.concatenate([mask_f, jnp.flip(mask_f, 0)], axis=1)
    prev_mask_t = jnp.concatenate(
        [jnp.zeros_like(mask_t[:1]), mask_t[:-1]], axis=0)
    k_noise, k_drop = jax.random.split(key)
    noise_t = d.noise(k_noise, (t, 2, b, f), h0.dtype)
    noise_prev_t = jnp.concatenate(
        [jnp.zeros_like(noise_t[:1]), noise_t[:-1]], axis=0)
    drop_t = _drop_mask(cfg, k_drop, (t, 2, b, f), h0.dtype, deterministic)

    if not deterministic and cfg.input_dropout >= 1.0:
        # --greedy_decoder training (see _run_direction): zero input at
        # every step for both directions — one stacked matmul per step.
        def greedy_step(carry, mt):
            h, c = carry
            hp = jnp.einsum("dbh,dhg->dbg", h, cell["w_hh"])
            hpb = hp + cell["b_hh"][:, None, :]
            if cfg.rnn_type == "LSTM":
                xpb = cell["b_ih"][:, None, :]
                i, fg, g, o = jnp.split(xpb + hpb, 4, axis=-1)
                c2 = (jax.nn.sigmoid(fg) * c
                      + jax.nn.sigmoid(i) * jnp.tanh(g))
                h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            elif cfg.rnn_type == "GRU":
                xr, xz, xn = jnp.split(cell["b_ih"][:, None, :], 3, -1)
                hr, hz, hn = jnp.split(hpb, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                h2, c2 = (1.0 - z) * jnp.tanh(xn + r * hn) + z * h, c
            else:
                h2, c2 = jnp.tanh(cell["b_ih"][:, None, :] + hpb), c
            h = jnp.where(mt, h2, h)
            c = jnp.where(mt, c2, c)
            return (h, c), h2

        _, rnn_out = jax.lax.scan(greedy_step,
                                  (jnp.stack([h0, h0r]),
                                   jnp.stack([c0, c0r])), mask_t,
                                  unroll=rnn_mod.SCAN_UNROLL)

        def split_dirs(x):
            return (jnp.swapaxes(x[:, 0], 0, 1),
                    jnp.swapaxes(jnp.flip(x[:, 1], 0), 0, 1))

        rnn_f, rnn_r = split_dirs(rnn_out)
        noise_fwd, noise_rev = split_dirs(noise_t)
        em_f = sampler_mod.sampler_apply(params["emission_sampler"], rnn_f)
        em_r = sampler_mod.sampler_apply(
            params["emission_sampler_reverse"], rnn_r)
        if emission_mode == "mean":
            out_f, out_r = em_f[0], em_r[0]
        else:
            out_f = d.from_noise(noise_fwd, *em_f)
            out_r = d.from_noise(noise_rev, *em_r)
        return (rnn_f, em_f, out_f), (rnn_r, em_r, out_r)

    # fused per-direction recurrent weight (2, H, G + k*m)
    w1 = emission["lin1"]["w"]                       # (2, k, H, m)
    _, k, h_in, m = w1.shape
    w1_flat = jnp.moveaxis(w1, 1, 2).reshape(2, h_in, k * m)
    gate_w = cell["w_hh"].shape[2]
    w_cat = jnp.concatenate([cell["w_hh"], w1_flat], axis=2)
    b1 = emission["lin1"]["b"]                       # (2, k, m)
    w2 = emission["lin2"]["w"]                       # (2, k, m, F)
    b2 = emission["lin2"]["b"]                       # (2, k, F)

    h_init = jnp.stack([h0, h0r])
    c_init = jnp.stack([c0, c0r])

    def step(carry, inp):
        h, c = carry
        if drop_t is None:
            mt, pmt, eps_prev = inp
        else:
            mt, pmt, eps_prev, dmask = inp
        big = jnp.einsum("dbh,dhg->dbg", h, w_cat)
        hp = big[..., :gate_w]
        emh = jnp.tanh(big[..., gate_w:].reshape(2, -1, k, m)
                       + b1[:, None, :, :])
        em_prev = (jnp.einsum("dbkm,dkmf->kdbf", emh, w2)
                   + jnp.moveaxis(b2, 0, 1)[:, :, None, :])
        if emission_mode == "mean":
            x = em_prev[0]
        else:
            x = d.from_noise(eps_prev, *tuple(em_prev))
        x = jnp.where(pmt, x, 0.0)
        if drop_t is not None:
            x = x * dmask
        # stacked-direction gate activations
        xp = (jnp.einsum("dbf,dfg->dbg", x, cell["w_ih"])
              + cell["b_ih"][:, None, :])
        hpb = hp + cell["b_hh"][:, None, :]
        if cfg.rnn_type == "LSTM":
            i, fg, g, o = jnp.split(xp + hpb, 4, axis=-1)
            c2 = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        elif cfg.rnn_type == "GRU":
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hpb, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            h2, c2 = (1.0 - z) * jnp.tanh(xn + r * hn) + z * h, c
        else:
            h2, c2 = jnp.tanh(xp + hpb), c
        h = jnp.where(mt, h2, h)
        c = jnp.where(mt, c2, c)
        return (h, c), h2

    xs = ((mask_t, prev_mask_t, noise_prev_t) if drop_t is None
          else (mask_t, prev_mask_t, noise_prev_t, drop_t))
    _, rnn_out = jax.lax.scan(step, (h_init, c_init), xs,
                              unroll=rnn_mod.SCAN_UNROLL)

    def split_dirs(x):  # (T, 2, B, .) -> fwd (B,T,.), rev (B,T,.)
        fwd = jnp.swapaxes(x[:, 0], 0, 1)
        rev = jnp.swapaxes(jnp.flip(x[:, 1], 0), 0, 1)
        return fwd, rev

    rnn_f, rnn_r = split_dirs(rnn_out)
    noise_fwd, noise_rev = split_dirs(noise_t)
    em_f = sampler_mod.sampler_apply(params["emission_sampler"], rnn_f)
    em_r = sampler_mod.sampler_apply(params["emission_sampler_reverse"],
                                     rnn_r)
    if emission_mode == "mean":
        out_f, out_r = em_f[0], em_r[0]
    else:
        out_f = d.from_noise(noise_fwd, *em_f)
        out_r = d.from_noise(noise_rev, *em_r)
    return (rnn_f, em_f, out_f), (rnn_r, em_r, out_r)


def _bce_with_logits_sum(logits: jax.Array, targets: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """Sum-reduced binary cross entropy with logits (stable form), parity
    with torch.nn.BCEWithLogitsLoss(reduction='sum') (model.py:122)."""
    per = (jnp.maximum(logits, 0.0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.sum(per * mask)


def _fused_loss_cells() -> tuple:
    """Cell types admitted to the fully fused in-kernel loss path beyond
    LSTM.  GRU and Elman default ON: on-hardware grad parity and a
    same-session stream/fused A/B are recorded in PROFILE_r04.json
    (v5e, 2026-08-19: GRU fused_grad_rel 6.5e-7, fetch-synced wall
    45.0->30.3 ms; Elman 2.4e-6, 37.6->23.1 ms at B=512 T=512 —
    scripts/decoder_kernel_parity.py + scripts/fused_loss_ab.py).
    ESN rides the Elman fused-loss kernel with a static leak; its
    hardware rows (fused_loss 0.0, fused_grad_rel 1.21e-6) landed
    2026-08-19, so it defaults ON with the others.  Narrow with
    SEQ2SEQ_FUSED_CELLS="" (empty) for stream-path A/B probes."""
    raw = os.environ.get("SEQ2SEQ_FUSED_CELLS", "GRU,RNN,ESN")
    return tuple(c.strip() for c in raw.split(",") if c.strip())


def decoder_apply(params: dict, cfg: DecoderConfig, features: jax.Array,
                  lengths: jax.Array, total_steps: int, *,
                  speaker: jax.Array | None = None,
                  ground_truth_out: jax.Array | None = None,
                  ground_truth_offset: jax.Array | None = None,
                  key: jax.Array,
                  deterministic: bool = False,
                  emission_mode: str = "sample",
                  loss_only: bool = False) -> DecoderOutput:
    """Decode a batch of latents.

    Args:
      features: (B, feature_size) latent vectors.
      lengths: (B,) valid step counts (0 for batch-padding rows).
      total_steps: static T (bucket max).
      speaker: (B,) int ids; required iff the config embeds speakers.
      ground_truth_out: (B, T, F) padded targets (enables emission_loss).
      ground_truth_offset: (B, T) end-of-sequence flags (enables
        offset_loss).
      emission_mode: 'sample' (default) or 'mean' (sampler2mean analogue).
      loss_only: caller promises (a) to consume ONLY the loss scalars
        (vae.forward_losses does) and (b) that any ground_truth_offset
        equals the training contract (t == lengths-1), as
        train/learner.py derives it.  Permits the fused in-kernel loss
        fast paths (ops/decoder_pallas.py), whose DecoderOutput carries
        out=None / emission_params=() — and, with offsets fused,
        offset_weights=None — instead of the dead (B, T, *) streams.
    """
    if cfg.rnn_type == "ESN":
        # Frozen reservoir (model.py:376,396 requires_grad=False): zero
        # grads for the cell weights; gradients still flow THROUGH the
        # recurrence to the latent (via h0) and the emission MLPs.
        params = dict(params)
        for cell_key in ("rnn_cell", "rnn_cell_reverse"):
            if cell_key in params:
                params[cell_key] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, params[cell_key])
    if cfg.has_speaker_embedding:
        emb = params["embed_speaker"][speaker]
        features = jnp.concatenate([features, emb], axis=-1)
    lin = params["feature2hidden"]
    hidden = features @ lin["w"] + lin["b"]
    mask = rnn_mod.lengths_to_mask(lengths, total_steps, hidden.dtype)
    fmask = mask

    if not cfg.bidirectional:
        h0, c0 = _split_hidden(cfg, hidden)
        key_f = jax.random.fold_in(key, 0)
        if (loss_only and ground_truth_out is not None
                and (cfg.rnn_type == "LSTM"
                     or (cfg.rnn_type in _fused_loss_cells()
                         and ground_truth_offset is not None))
                and emission_mode == "sample"
                and (deterministic or cfg.input_dropout <= 0.0)
                and cfg.emission_distr_name == "isotropic_gaussian"
                and rnn_mod.resolved_backend() == "pallas"
                and os.environ.get("SEQ2SEQ_NLL_FUSION", "1") != "0"
                and params["emission_sampler"]["to_parameters"]
                          ["lin1"]["w"].shape[0] == 2):
            d = dist.choose_distribution(cfg.emission_distr_name)
            if ground_truth_offset is not None:
                # full fusion: emission NLL + offset BCE in-kernel; the
                # (t == len-1) offset target is part of the loss_only
                # contract (train/learner.py derives is_offset exactly
                # so)
                out_last, nll, bce = _run_direction_fused_losses(
                    cfg, params["rnn_cell"], params["emission_sampler"],
                    params["offset_predictor"], h0, c0, mask, key_f,
                    ground_truth_out)
                last = sampler_mod.sampler_apply(
                    params["emission_sampler"], out_last)
                emission_loss = nll - d.log_pdf(ground_truth_out[:, -1],
                                                *last,
                                                mask=fmask[:, -1:])
                return DecoderOutput(emission_loss, bce, None, (), None)
            outs, nll = _run_direction_fused_nll(
                cfg, params["rnn_cell"], params["emission_sampler"],
                h0, c0, mask, key_f, ground_truth_out)
            rnn_out = jnp.swapaxes(outs, 0, 1).astype(hidden.dtype)
            offset_logits = mlp_mod.mlp_apply(params["offset_predictor"],
                                              rnn_out).squeeze(-1)
            # position T-1's term: the kernel's step-0 emission parks on
            # that slot, so its loss term comes from the final carry —
            # the same one-step recompute the stream path's .at[-1].set
            # overwrite used
            last = sampler_mod.sampler_apply(params["emission_sampler"],
                                             outs[-1])
            emission_loss = nll - d.log_pdf(ground_truth_out[:, -1],
                                            *last, mask=fmask[:, -1:])
            return DecoderOutput(emission_loss, None, None, (),
                                 offset_logits)
        rnn_out, em, out = _run_direction(
            cfg, params["rnn_cell"], params["emission_sampler"], h0, c0,
            mask, key_f, deterministic, emission_mode)
        offset_logits = mlp_mod.mlp_apply(params["offset_predictor"],
                                          rnn_out).squeeze(-1)
        emission_loss = None
        if ground_truth_out is not None:
            d = dist.choose_distribution(cfg.emission_distr_name)
            emission_loss = -d.log_pdf(ground_truth_out, *em,
                                       mask=fmask[..., None])
        offset_loss = None
        if ground_truth_offset is not None:
            offset_loss = _bce_with_logits_sum(offset_logits,
                                               ground_truth_offset, fmask)
        return DecoderOutput(emission_loss, offset_loss, out, em,
                             offset_logits)

    # --- bidirectional (model.py:198-260) ---
    b = features.shape[0]
    both = hidden.reshape(b, -1, 2)
    h0_f, c0_f = _split_hidden(cfg, both[..., 0])
    h0_r, c0_r = _split_hidden(cfg, both[..., 1])

    if cfg.rnn_type != "ESN":
        (rnn_out_f, em_f, out_f), (rnn_out_r, em_r, out_r) = (
            _run_both_directions(cfg, params, h0_f, c0_f, h0_r, c0_r, mask,
                                 jax.random.fold_in(key, 0), deterministic,
                                 emission_mode))
    else:
        key_f = jax.random.fold_in(key, 0)
        key_r = jax.random.fold_in(key, 1)
        rnn_out_f, em_f, out_f = _run_direction(
            cfg, params["rnn_cell"], params["emission_sampler"], h0_f, c0_f,
            mask, key_f, deterministic, emission_mode)
        # Reverse: scan step s processes position T-1-s; flip masks in,
        # flip stacked outputs back to position-major.
        rev_mask = jnp.flip(mask, axis=1)
        rnn_out_r, em_r, out_r = _run_direction(
            cfg, params["rnn_cell_reverse"],
            params["emission_sampler_reverse"], h0_r, c0_r, rev_mask, key_r,
            deterministic, emission_mode, mask_is_prefix=False)
        rnn_out_r = jnp.flip(rnn_out_r, axis=1)
        em_r = tuple(jnp.flip(p, axis=1) for p in em_r)
        out_r = jnp.flip(out_r, axis=1)

    offset_logits_f = mlp_mod.mlp_apply(params["offset_predictor"],
                                        rnn_out_f).squeeze(-1)
    offset_logits_r = mlp_mod.mlp_apply(params["offset_predictor_reverse"],
                                        rnn_out_r).squeeze(-1)

    log_w_l2r = math.log(1.0 - cfg.right2left_weight)
    log_w_r2l = math.log(cfg.right2left_weight)
    emission_loss = None
    if ground_truth_out is not None:
        d = dist.choose_distribution(cfg.emission_distr_name)
        lp_f = -d.log_pdf(ground_truth_out, *em_f, mask=fmask[..., None])
        lp_r = -d.log_pdf(ground_truth_out, *em_r, mask=fmask[..., None])
        emission_loss = jax.nn.logsumexp(
            jnp.stack([lp_f + log_w_l2r, lp_r + log_w_r2l]))
    offset_loss = None
    if ground_truth_offset is not None:
        bce_f = _bce_with_logits_sum(offset_logits_f, ground_truth_offset,
                                     fmask)
        bce_r = _bce_with_logits_sum(offset_logits_r, ground_truth_offset,
                                     fmask)
        offset_loss = jax.nn.logsumexp(jnp.stack([bce_f, bce_r]))
    return DecoderOutput(emission_loss, offset_loss, out_f, em_f,
                         offset_logits_f, out_r, em_r, offset_logits_r)
