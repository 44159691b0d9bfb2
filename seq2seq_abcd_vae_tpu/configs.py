"""Model/module configuration dataclasses.

Each config round-trips to/from the exact ``pack_init_parameters`` dict the
reference stores beside each module's ``state_dict`` in ``checkpoint.pt``
(reference: ABCD-VAE/modules/model.py:68-79,126-145,661-673,699-706), which
is what makes our checkpoints self-describing in the same way.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class EncoderConfig:
    """RNN_Variational_Encoder config (reference: model.py:48-58)."""
    input_size: int
    rnn_hidden_size: int
    rnn_type: str = "LSTM"
    rnn_layers: int = 1
    hidden_dropout: float = 0.0
    bidirectional: bool = True
    esn_leak: float = 1.0

    @property
    def hidden_size_total(self) -> int:
        """Flattened final-state width: layers*hidden*(2 if bidir)*(2 if LSTM)
        (reference: model.py:54-58)."""
        total = self.rnn_layers * self.rnn_hidden_size
        if self.bidirectional:
            total *= 2
        if self.rnn_type == "LSTM":
            total *= 2
        return total

    def pack_init_parameters(self) -> dict[str, Any]:
        p = {
            "input_size": self.input_size,
            "rnn_hidden_size": self.rnn_hidden_size,
            "rnn_type": self.rnn_type,
            "rnn_layers": self.rnn_layers,
            "hidden_dropout": self.hidden_dropout,
            "bidirectional": self.bidirectional,
        }
        if self.rnn_type == "ESN":
            p["esn_leak"] = self.esn_leak
        return p

    @classmethod
    def from_init_parameters(cls, p: dict[str, Any]) -> "EncoderConfig":
        return cls(**p)


@dataclass(frozen=True)
class DecoderConfig:
    """RNN_Variational_Decoder config (reference: model.py:91-124)."""
    output_size: int
    rnn_hidden_size: int
    mlp_hidden_size: int
    feature_size: int  # latent width, w/o speaker embedding
    emission_distr_name: str = "isotropic_gaussian"
    rnn_type: str = "LSTM"
    rnn_layers: int = 1
    input_dropout: float = 0.0
    self_feedback: bool = True
    bidirectional: bool = False
    right2left_weight: float = 0.5
    esn_leak: float = 1.0
    num_speakers: Optional[int] = None
    speaker_embed_dim: Optional[int] = None

    def __post_init__(self):
        if self.rnn_layers != 1:
            raise ValueError("Only rnn_layers=1 is currently supported "
                             "(parity with reference model.py:93).")
        if not self.self_feedback:
            # --greedy_decoder == input_dropout 1.0 (reference model.py:94-95)
            object.__setattr__(self, "input_dropout", 1.0)

    @property
    def has_speaker_embedding(self) -> bool:
        return (self.num_speakers is not None
                and self.speaker_embed_dim is not None)

    @property
    def hidden_size_total(self) -> int:
        total = self.rnn_layers * self.rnn_hidden_size
        if self.rnn_type == "LSTM":
            total *= 2
        if self.bidirectional:
            total *= 2
        return total

    def pack_init_parameters(self) -> dict[str, Any]:
        p = {
            "output_size": self.output_size,
            "rnn_hidden_size": self.rnn_hidden_size,
            "mlp_hidden_size": self.mlp_hidden_size,
            "feature_size": self.feature_size,
            "emission_distr_name": self.emission_distr_name,
            "rnn_type": self.rnn_type,
            "rnn_layers": 1,
            "input_dropout": self.input_dropout,
            "bidirectional": self.bidirectional,
        }
        if self.rnn_type == "ESN":
            p["esn_leak"] = self.esn_leak
        if self.has_speaker_embedding:
            p["num_speakers"] = self.num_speakers
            p["speaker_embed_dim"] = self.speaker_embed_dim
        if self.bidirectional:
            p["right2left_weight"] = self.right2left_weight
        return p

    @classmethod
    def from_init_parameters(cls, p: dict[str, Any]) -> "DecoderConfig":
        return cls(**p)


@dataclass(frozen=True)
class ABCDSamplerConfig:
    """ABCDSampler config incl. temperature-anneal state
    (reference: model.py:542-560,661-673)."""
    input_size: int
    mlp_hidden_size: int
    num_categories: int
    feature_dim: int
    prior_concentration: float = 1.0
    min_temperature: float = 1.0
    epoch_init_iter_counts: int = 0
    temperature_update_freq: int = 1000
    temperature_anneal_rate: float = 1e-5

    def pack_init_parameters(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_init_parameters(cls, p: dict[str, Any]) -> "ABCDSamplerConfig":
        return cls(**p)


@dataclass(frozen=True)
class GaussianSamplerConfig:
    """Generic (plain-VAE) Sampler config (reference: model.py:676-706)."""
    input_size: int
    mlp_hidden_size: int
    output_size: int
    distribution_name: str = "isotropic_gaussian"

    def pack_init_parameters(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_init_parameters(cls, p: dict[str, Any]) -> "GaussianSamplerConfig":
        return cls(**p)
