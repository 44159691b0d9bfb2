"""Import a reference (PyTorch) checkpoint.pt into this framework.

A user of the reference can bring trained models along: the reference's
rolling checkpoint is self-describing (module ``state_dict``s beside
``*_init_parameters`` dicts, ABCD-VAE/learning.py:298-312), so the mapping
is purely mechanical:

- torch Linear / RNN weights are (out, in); ours are stored transposed
  (in, out) for row-major x @ W.  Gate orders already agree (LSTM i,f,g,o;
  GRU r,z,n).
- MLP_To_k_Vecs' k parallel MLPs (``to_parameters.mlps.{k}``) stack into
  our leading-k arrays.
- The decoder's interleaved initial-state reshape and the encoder's
  (layer, direction, [h|c]) flattening are layout-identical by
  construction, so no permutation is needed beyond transposes.

Optimizer/scheduler state is intentionally not imported (fresh SGD); the
model parameters and the temperature-anneal counter are.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ..configs import (ABCDSamplerConfig, DecoderConfig, EncoderConfig,
                       GaussianSamplerConfig)


def _t(state: Mapping, name: str) -> np.ndarray:
    x = state[name]
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _mlp(state: Mapping, prefix: str) -> dict:
    return {
        "lin1": {"w": _t(state, f"{prefix}.whole_network.0.weight").T,
                 "b": _t(state, f"{prefix}.whole_network.0.bias")},
        "lin2": {"w": _t(state, f"{prefix}.whole_network.2.weight").T,
                 "b": _t(state, f"{prefix}.whole_network.2.bias")},
    }


def _mlp_k(state: Mapping, prefix: str, k: int) -> dict:
    mlps = [_mlp(state, f"{prefix}.mlps.{i}") for i in range(k)]
    return {
        "lin1": {"w": np.stack([m["lin1"]["w"] for m in mlps]),
                 "b": np.stack([m["lin1"]["b"] for m in mlps])},
        "lin2": {"w": np.stack([m["lin2"]["w"] for m in mlps]),
                 "b": np.stack([m["lin2"]["b"] for m in mlps])},
    }


def _rnn_layer(state: Mapping, prefix: str, l: int, suffix: str) -> dict:
    return {
        "w_ih": _t(state, f"{prefix}.weight_ih_l{l}{suffix}").T,
        "w_hh": _t(state, f"{prefix}.weight_hh_l{l}{suffix}").T,
        "b_ih": _t(state, f"{prefix}.bias_ih_l{l}{suffix}"),
        "b_hh": _t(state, f"{prefix}.bias_hh_l{l}{suffix}"),
    }


def _esn_layer(state: Mapping, prefix: str, l: int, suffix: str) -> dict:
    return {
        "w_ih": _t(state, f"{prefix}.weight_ih_l{l}{suffix}").T,
        "w_hh": _t(state, f"{prefix}.weight_hh_l{l}{suffix}").T,
    }


def import_encoder(state: Mapping, cfg: EncoderConfig) -> dict:
    layers = []
    for l in range(cfg.rnn_layers):
        build = _esn_layer if cfg.rnn_type == "ESN" else _rnn_layer
        entry = {"fwd": build(state, "rnn", l, "")}
        if cfg.bidirectional:
            entry["bwd"] = build(state, "rnn", l, "_reverse")
        layers.append(entry)
    return {"layers": layers}


def import_abcd(state: Mapping, cfg: ABCDSamplerConfig) -> dict:
    return {
        "to_code_like": _mlp(state, "to_code_like"),
        "posterior_shape_logits": _t(state, "posterior_shape_logits"),
        "codebook": _t(state, "codebook"),
    }


def import_gaussian(state: Mapping, cfg: GaussianSamplerConfig) -> dict:
    from ..distributions import choose_distribution
    k = choose_distribution(cfg.distribution_name).num_parameters
    return {"to_parameters": _mlp_k(state, "to_parameters", k)}


def _cell(state: Mapping, prefix: str, rnn_type: str) -> dict:
    if rnn_type == "ESN":
        return {"w_ih": _t(state, f"{prefix}.cell.weight_ih").T,
                "w_hh": _t(state, f"{prefix}.cell.weight_hh").T}
    return {"w_ih": _t(state, f"{prefix}.cell.weight_ih").T,
            "w_hh": _t(state, f"{prefix}.cell.weight_hh").T,
            "b_ih": _t(state, f"{prefix}.cell.bias_ih"),
            "b_hh": _t(state, f"{prefix}.cell.bias_hh")}


def import_decoder(state: Mapping, cfg: DecoderConfig) -> dict:
    from ..distributions import choose_distribution
    k = choose_distribution(cfg.emission_distr_name).num_parameters
    params = {
        "feature2hidden": {"w": _t(state, "feature2hidden.weight").T,
                           "b": _t(state, "feature2hidden.bias")},
        "rnn_cell": _cell(state, "rnn_cell", cfg.rnn_type),
        "emission_sampler": {"to_parameters": _mlp_k(
            state, "emission_sampler.to_parameters", k)},
        "offset_predictor": _mlp(state, "offset_predictor"),
    }
    if cfg.has_speaker_embedding:
        params["embed_speaker"] = _t(state, "embed_speaker.weight")
    if cfg.bidirectional:
        params["rnn_cell_reverse"] = _cell(state, "rnn_cell_reverse",
                                           cfg.rnn_type)
        params["emission_sampler_reverse"] = {"to_parameters": _mlp_k(
            state, "emission_sampler_reverse.to_parameters", k)}
        params["offset_predictor_reverse"] = _mlp(
            state, "offset_predictor_reverse")
    return params


def import_torch_checkpoint(torch_ckpt: Mapping,
                            latent_type: str | None = None) -> dict:
    """Reference checkpoint dict (as loaded by torch.load) -> our
    checkpoint payload (train.checkpoint schema)."""
    enc_cfg = EncoderConfig.from_init_parameters(
        torch_ckpt["encoder_init_parameters"])
    latent_init = dict(torch_ckpt["feature_sampler_init_parameters"])
    if latent_type is None:
        latent_type = ("abcd" if "num_categories" in latent_init
                       else "gaussian")
    dec_cfg = DecoderConfig.from_init_parameters(
        torch_ckpt["decoder_init_parameters"])
    if latent_type == "abcd":
        lat_cfg = ABCDSamplerConfig.from_init_parameters(latent_init)
        latent_params = import_abcd(torch_ckpt["feature_sampler"], lat_cfg)
    else:
        lat_cfg = GaussianSamplerConfig.from_init_parameters(latent_init)
        latent_params = import_gaussian(torch_ckpt["feature_sampler"],
                                        lat_cfg)
    from .optim import ReduceLROnPlateau
    return {
        "epoch": torch_ckpt.get("epoch", 0),
        "latent_type": latent_type,
        "encoder": import_encoder(torch_ckpt["encoder"], enc_cfg),
        "encoder_init_parameters": enc_cfg.pack_init_parameters(),
        "feature_sampler": latent_params,
        "feature_sampler_init_parameters": lat_cfg.pack_init_parameters()
        if latent_type != "abcd" else {
            **lat_cfg.pack_init_parameters(),
            "epoch_init_iter_counts": latent_init.get(
                "epoch_init_iter_counts", 0)},
        "decoder": import_decoder(torch_ckpt["decoder"], dec_cfg),
        "decoder_init_parameters": dec_cfg.pack_init_parameters(),
        "optimizer": None,  # fresh SGD on resume
        "momentum": 0.0,
        "lr_scheduler": ReduceLROnPlateau().state_dict(),
        "gradient_clip": torch_ckpt.get("gradient_clip", 1.0),
        "random_state": np.asarray([0, 0], np.uint32),
    }
