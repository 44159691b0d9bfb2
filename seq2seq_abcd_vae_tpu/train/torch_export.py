"""Export a checkpoint of this framework to a reference-loadable
PyTorch ``checkpoint.pt`` — the inverse of ``torch_import``.

The reference ecosystem's checkpoint IS its interchange format
(ABCD-VAE/learning.py:293-347): downstream analysis pipelines call the
reference's ``encode*.py`` on a ``checkpoint.pt``.  This module emits a
dict that ``torch.save`` writes and the unmodified reference
``retrieve_model`` consumes: module ``state_dict``-style tensor dicts
under the reference's exact key names/layouts (Linear/RNN weights (out,
in); k-stacked MLPs unstacked into ``mlps.{i}``), beside
``*_init_parameters`` dicts that reconstruct the modules via
``Module(**params)`` (learning.py:322-324), plus fresh optimizer /
scheduler / RNG entries in torch's own state-dict formats so a resumed
reference training run also loads.

Verified end-to-end by scripts/verify_export_against_reference.py: the
unmodified reference encode.py on an exported checkpoint reproduces our
encode_main probabilities.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..configs import (ABCDSamplerConfig, DecoderConfig, EncoderConfig,
                       GaussianSamplerConfig)
from ..distributions import choose_distribution


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _mlp(params: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.whole_network.0.weight"] = _np(params["lin1"]["w"]).T
    out[f"{prefix}.whole_network.0.bias"] = _np(params["lin1"]["b"])
    out[f"{prefix}.whole_network.2.weight"] = _np(params["lin2"]["w"]).T
    out[f"{prefix}.whole_network.2.bias"] = _np(params["lin2"]["b"])


def _mlp_k(params: dict, prefix: str, out: dict) -> None:
    k = _np(params["lin1"]["w"]).shape[0]
    for i in range(k):
        _mlp({"lin1": {"w": params["lin1"]["w"][i],
                       "b": params["lin1"]["b"][i]},
              "lin2": {"w": params["lin2"]["w"][i],
                       "b": params["lin2"]["b"][i]}},
             f"{prefix}.mlps.{i}", out)


def export_encoder(params: dict, cfg: EncoderConfig) -> dict:
    out: dict[str, np.ndarray] = {}
    for l, layer in enumerate(params["layers"]):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if direction not in layer:
                continue
            p = layer[direction]
            out[f"rnn.weight_ih_l{l}{suffix}"] = _np(p["w_ih"]).T
            out[f"rnn.weight_hh_l{l}{suffix}"] = _np(p["w_hh"]).T
            if "b_ih" in p:  # ESN layers have no biases
                out[f"rnn.bias_ih_l{l}{suffix}"] = _np(p["b_ih"])
                out[f"rnn.bias_hh_l{l}{suffix}"] = _np(p["b_hh"])
    return out


def export_abcd(params: dict, cfg: ABCDSamplerConfig) -> dict:
    out = {
        "posterior_shape_logits": _np(params["posterior_shape_logits"]),
        "codebook": _np(params["codebook"]),
        # registered buffer in the reference (model.py:563-565)
        "prior_concentration": np.float32(cfg.prior_concentration),
    }
    _mlp(params["to_code_like"], "to_code_like", out)
    return out


def export_gaussian(params: dict, cfg: GaussianSamplerConfig) -> dict:
    out: dict[str, np.ndarray] = {}
    _mlp_k(params["to_parameters"], "to_parameters", out)
    return out


def _cell(params: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.cell.weight_ih"] = _np(params["w_ih"]).T
    out[f"{prefix}.cell.weight_hh"] = _np(params["w_hh"]).T
    if "b_ih" in params:
        out[f"{prefix}.cell.bias_ih"] = _np(params["b_ih"])
        out[f"{prefix}.cell.bias_hh"] = _np(params["b_hh"])


def export_decoder(params: dict, cfg: DecoderConfig) -> dict:
    out: dict[str, np.ndarray] = {}
    if "embed_speaker" in params:
        out["embed_speaker.weight"] = _np(params["embed_speaker"])
    out["feature2hidden.weight"] = _np(params["feature2hidden"]["w"]).T
    out["feature2hidden.bias"] = _np(params["feature2hidden"]["b"])
    _mlp(params["offset_predictor"], "offset_predictor", out)
    _mlp_k(params["emission_sampler"]["to_parameters"],
           "emission_sampler.to_parameters", out)
    _cell(params["rnn_cell"], "rnn_cell", out)
    if cfg.bidirectional:
        _mlp(params["offset_predictor_reverse"],
             "offset_predictor_reverse", out)
        _mlp_k(params["emission_sampler_reverse"]["to_parameters"],
               "emission_sampler_reverse.to_parameters", out)
        _cell(params["rnn_cell_reverse"], "rnn_cell_reverse", out)
    return out


def _num_torch_parameters(state: dict, module: str) -> int:
    """Count entries of a state_dict that are trainable parameters in the
    reference modules (everything except the ABCDSampler's
    prior_concentration buffer, model.py:563-565)."""
    return sum(1 for k in state if k != "prior_concentration")


def _torch_scheduler_state(lr_scheduler: dict[str, Any],
                           lr: float) -> dict[str, Any]:
    """Our ReduceLROnPlateau state -> torch's state_dict layout."""
    s = dict(lr_scheduler)
    return {
        "factor": s.get("factor", 0.1),
        "default_min_lr": s.get("min_lr", 0.0),
        "min_lrs": [s.get("min_lr", 0.0)],
        "patience": s.get("patience", 0),
        "cooldown": s.get("cooldown", 0),
        "eps": s.get("eps", 1e-8),
        "last_epoch": s.get("last_epoch", 0),
        "_last_lr": [lr],
        "mode_worse": math.inf,
        "mode": "min",
        "threshold": s.get("threshold", 1e-4),
        "threshold_mode": s.get("threshold_mode", "rel"),
        "best": s.get("best", math.inf),
        "cooldown_counter": s.get("cooldown_counter", 0),
        "num_bad_epochs": s.get("num_bad_epochs", 0),
    }


def export_torch_checkpoint(payload: dict[str, Any],
                            learning_rate: float = 1.0) -> dict[str, Any]:
    """Our checkpoint payload (train.checkpoint schema) -> a dict for
    ``torch.save`` that the unmodified reference loads.

    Tensor conversion happens here (torch required); momentum buffers are
    intentionally not exported (the reference resumes with a fresh SGD
    state, mirroring torch_import's policy).
    """
    import torch

    enc_cfg = EncoderConfig.from_init_parameters(
        payload["encoder_init_parameters"])
    latent_type = payload.get("latent_type", "abcd")
    latent_init = dict(payload["feature_sampler_init_parameters"])
    if latent_type == "abcd":
        lat_cfg = ABCDSamplerConfig.from_init_parameters(latent_init)
        sampler_state = export_abcd(payload["feature_sampler"], lat_cfg)
    else:
        lat_cfg = GaussianSamplerConfig.from_init_parameters(latent_init)
        sampler_state = export_gaussian(payload["feature_sampler"], lat_cfg)
    dec_cfg = DecoderConfig.from_init_parameters(
        payload["decoder_init_parameters"])

    enc_state = export_encoder(payload["encoder"], enc_cfg)
    dec_state = export_decoder(payload["decoder"], dec_cfg)
    num_params = (_num_torch_parameters(enc_state, "encoder")
                  + _num_torch_parameters(sampler_state, "feature_sampler")
                  + _num_torch_parameters(dec_state, "decoder"))

    def to_torch(state):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}

    # torch.get_rng_state() layout without mutating global RNG state
    rng_state = torch.random.get_rng_state()

    return {
        "epoch": payload.get("epoch", 0),
        "encoder": to_torch(enc_state),
        "encoder_init_parameters": enc_cfg.pack_init_parameters(),
        "feature_sampler": to_torch(sampler_state),
        "feature_sampler_init_parameters": lat_cfg.pack_init_parameters(),
        "decoder": to_torch(dec_state),
        "decoder_init_parameters": dec_cfg.pack_init_parameters(),
        "optimizer": {
            "state": {},
            "param_groups": [{
                "lr": learning_rate,
                "momentum": payload.get("momentum", 0.0) or 0,
                "dampening": 0, "weight_decay": 0, "nesterov": False,
                "maximize": False, "foreach": None, "differentiable": False,
                "fused": None,
                "params": list(range(num_params)),
            }],
        },
        "lr_scheduler": _torch_scheduler_state(
            payload.get("lr_scheduler", {}), learning_rate),
        "gradient_clip": payload.get("gradient_clip", 1.0),
        "random_state": rng_state,
    }
