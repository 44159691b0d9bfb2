"""Learner: the training/validation runtime.

Reference: Learner, ABCD-VAE/learning.py:36-347 (and plain/learning.py's
Gaussian variant — here a ``latent_type`` config choice, not a second code
tree).  Contract kept:

- ``save_dir/history.log`` is both the metric log (same line formats — the
  de-facto metric API) and the resume marker;
- single rolling self-describing ``checkpoint.pt`` with module init-param
  dicts, optimizer/scheduler state and RNG state;
- SGD + global-norm clip + ReduceLROnPlateau on mean validation loss;
  pretraining epochs run the ABCD head without Gumbel-Softmax sampling and
  do not advance the temperature counter; at pretraining end the scheduler
  best is reset (learning.py:273,164-165,283-286);
- losses are per-batch sums normalized by the real row count; epoch lines
  report per-string means (learning.py:155-157,188-195).

TPU-first runtime: the whole step — STFT frontend, encoder, latent head,
decoder, loss, grads, SGD update — is one jitted XLA program per bucket
shape.  Matmul precision defaults to float32 ('highest') for parity; set
``matmul_precision='default'`` to let the MXU use bf16 passes.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, replace as dataclass_replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (ABCDSamplerConfig, DecoderConfig, EncoderConfig,
                       GaussianSamplerConfig)
from ..data.batching import DataLoader, FrontendSpec, RawBatch
from ..models import abcd as abcd_mod
from ..models import vae
from ..ops import stft as stft_ops
from . import checkpoint as ckpt
from . import optim
from .logging_utils import logger, update_log_handler


@dataclass(frozen=True)
class StepStatics:
    """Everything shape-/code-determining for the jitted step."""
    model: vae.ModelConfig
    frame_length: int
    step_size: int
    window: str
    epsilon: float
    normalizer: float
    stft_method: str = "fft"
    # resolved kernel backend (scan|pallas): model code reads the live
    # selector at trace time; this field's only job is to be part of the
    # jit cache key so an epoch-boundary backend switch forces a retrace
    # (utils/backend_select.py)
    rnn_backend: str = "scan"


def _frontend(statics: StepStatics, audio: jax.Array,
              bucket_frames: int) -> jax.Array:
    return stft_ops.log_spectrogram(
        audio, statics.frame_length, statics.step_size, bucket_frames,
        statics.epsilon, statics.normalizer, window=statics.window,
        method=statics.stft_method)


def _losses_and_metrics(params, statics: StepStatics, audio, num_frames,
                        speakers, key, entire_n, temperature, no_sample,
                        deterministic, bucket_frames):
    cfg = statics.model
    inputs = _frontend(statics, audio, bucket_frames)
    is_offset = (jnp.arange(bucket_frames, dtype=num_frames.dtype)[None, :]
                 == num_frames[:, None] - 1).astype(inputs.dtype)
    batch = {"inputs": inputs, "lengths": num_frames, "speakers": speakers,
             "is_offset": is_offset}
    loss, aux = vae.training_loss(
        params, cfg, batch, key, entire_n, temperature=temperature,
        no_sample=no_sample, deterministic=deterministic)
    metrics = {
        "loss": loss,
        "emission_loss": aux["emission_loss"],
        "offset_loss": aux["offset_loss"],
        "kl_loss": aux["kl_loss"],
        "num_rows": aux["num_rows"],
    }
    if cfg.latent_type == "abcd":
        row_mask = (num_frames > 0).astype(inputs.dtype)
        probs = jax.nn.softmax(aux["category_logits"], -1)
        ent = -jnp.sum(probs * jnp.log(probs), -1)
        metrics["clustering_perplex"] = jnp.exp(
            jnp.sum(ent * row_mask) / aux["num_rows"])
        mean_probs = (jnp.sum(probs * row_mask[:, None], 0)
                      / aux["num_rows"])
        mean_probs = mean_probs / jnp.sum(mean_probs)
        metrics["batch_perplex"] = jnp.exp(
            -jnp.sum(mean_probs * jnp.log(mean_probs)))
        shape = jax.nn.softmax(
            params["feature_sampler"]["posterior_shape_logits"], -1)
        metrics["posterior_shape_perplex"] = jnp.exp(
            -jnp.sum(shape * jnp.log(shape)))
    return loss, metrics


@functools.partial(jax.jit, static_argnames=(
    "statics", "no_sample", "bucket_frames", "tx"),
    donate_argnums=(0, 1))  # params/opt_state are reassigned every step
def _train_step(params, opt_state, audio, num_frames, speakers, key,
                entire_n, temperature, *, statics: StepStatics,
                no_sample: bool, bucket_frames: int, tx):
    def loss_fn(p):
        return _losses_and_metrics(p, statics, audio, num_frames, speakers,
                                   key, entire_n, temperature, no_sample,
                                   False, bucket_frames)
    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state, metrics


@functools.partial(jax.jit, static_argnames=(
    "statics", "no_sample", "bucket_frames"))
def _eval_step(params, audio, num_frames, speakers, key, entire_n,
               temperature, *, statics: StepStatics, no_sample: bool,
               bucket_frames: int):
    _, metrics = _losses_and_metrics(params, statics, audio, num_frames,
                                     speakers, key, entire_n, temperature,
                                     no_sample, True, bucket_frames)
    return metrics


class Learner:
    """Builds (or retrieves) the model and runs the training loop."""

    def __init__(self,
                 input_size: Optional[int] = None,
                 encoder_rnn_hidden_size: int = 256,
                 decoder_rnn_hidden_size: int = 256,
                 mlp_hidden_size: int = 256,
                 num_feature_categories: Optional[int] = None,  # abcd
                 feature_dim: Optional[int] = None,             # abcd
                 feature_size: Optional[int] = None,            # gaussian
                 save_dir: str = ".",
                 latent_type: str = "abcd",
                 feature_distribution: str = "isotropic_gaussian",
                 encoder_rnn_type: str = "LSTM",
                 decoder_rnn_type: str = "LSTM",
                 encoder_rnn_layers: int = 1,
                 bidirectional_encoder: bool = True,
                 bidirectional_decoder: bool = False,
                 right2left_decoder_weight: float = 0.5,
                 encoder_hidden_dropout: float = 0.0,
                 decoder_input_dropout: float = 0.0,
                 device: str = "",
                 seed: int = 1111,
                 emission_distribution: str = "isotropic_gaussian",
                 decoder_self_feedback: bool = True,
                 esn_leak: float = 1.0,
                 num_speakers: Optional[int] = None,
                 speaker_embed_dim: Optional[int] = None,
                 prior_concentration: float = 1.0,
                 matmul_precision: str = "highest",
                 stft_method: str = "fft",
                 num_data_partitions: Optional[int] = None,
                 profile_dir: Optional[str] = None,
                 length_sorted_batches: bool = False,
                 batching_mode: Optional[str] = None,
                 device_corpus_cache: str = "auto"):
        self.retrieval, self.log_file_path = update_log_handler(
            save_dir, primary=jax.process_index() == 0)
        self.save_dir = save_dir
        self.stft_method = stft_method
        if matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              matmul_precision)
        self.device = self._pick_device(device)
        self._setup_mesh(num_data_partitions)
        self.profile_dir = profile_dir
        self.length_sorted_batches = length_sorted_batches
        # Batch composition policy (data/batching.py): bucket-homogeneous
        # shuffled batches by default (minimal padding waste); 'uniform'
        # reproduces the reference's uniform draws exactly.
        self.batching_mode = (batching_mode if batching_mode
                              else ("length_sorted" if length_sorted_batches
                                    else "bucket_shuffled"))
        # 'auto'|'on'|'off': keep the corpus device-resident and gather
        # batches on-device (data/device_cache.py) when single-process
        # and small enough; per-batch transfer drops to a (B,) index
        self.device_corpus_cache = device_corpus_cache
        self._device_caches: dict = {}
        self._checkpointer = ckpt.AsyncCheckpointer()
        logger.info("Device: {device}".format(
            device=device or str(self.device)))
        if self.device.platform != "cpu":
            # resolve the kernel backend once, outside jit (auto mode
            # measures one pallas_call dispatch; utils/backend_select.py)
            from ..utils.backend_select import backend_report
            logger.info("Kernel backend: {r}".format(r=backend_report()))

        if self.retrieval:
            self.last_epoch = self.retrieve_model(device=device)
            logger.info("Model retrieved.")
            return

        self.key = jax.random.PRNGKey(seed)
        if encoder_hidden_dropout > 0.0 and encoder_rnn_layers == 1:
            logger.warning(
                "Non-zero dropout cannot be used for the single-layer "
                "encoder RNN (because there is no non-top hidden layers).")
            logger.info("encoder_hidden_dropout reset from {do} to "
                        "0.0.".format(do=encoder_hidden_dropout))
            encoder_hidden_dropout = 0.0

        enc_cfg = EncoderConfig(
            input_size, encoder_rnn_hidden_size, rnn_type=encoder_rnn_type,
            rnn_layers=encoder_rnn_layers,
            hidden_dropout=encoder_hidden_dropout,
            bidirectional=bidirectional_encoder, esn_leak=esn_leak)
        if latent_type == "abcd":
            latent_cfg = ABCDSamplerConfig(
                enc_cfg.hidden_size_total, mlp_hidden_size,
                num_feature_categories, feature_dim,
                prior_concentration=prior_concentration)
            latent_width = feature_dim
        else:
            latent_cfg = GaussianSamplerConfig(
                enc_cfg.hidden_size_total, mlp_hidden_size, feature_size,
                distribution_name=feature_distribution)
            latent_width = feature_size
        dec_cfg = DecoderConfig(
            input_size, decoder_rnn_hidden_size, mlp_hidden_size,
            latent_width, emission_distr_name=emission_distribution,
            rnn_type=decoder_rnn_type, input_dropout=decoder_input_dropout,
            self_feedback=decoder_self_feedback,
            bidirectional=bidirectional_decoder,
            right2left_weight=right2left_decoder_weight, esn_leak=esn_leak,
            num_speakers=num_speakers, speaker_embed_dim=speaker_embed_dim)
        self.model_cfg = vae.ModelConfig(enc_cfg, latent_cfg, dec_cfg)
        self.key, init_key = jax.random.split(self.key)
        with jax.default_device(self.device):
            self.params = vae.model_init(init_key, self.model_cfg)
        self.iter_counts = 0
        self.epoch_init_iter_counts = 0

        if latent_type == "abcd":
            logger.info("Data are encoded into one of {num_cat} possible "
                        "{feature_dim}-dim feature vectors.".format(
                            num_cat=num_feature_categories,
                            feature_dim=feature_dim))
            logger.info("Discrete categories are assumed to be distributed "
                        "according to Categorical(pi), with Dirichlet({}) "
                        "prior on pi.".format(prior_concentration))
            logger.info("Conditioned on the RNN-transformed features, data "
                        "are assumed to be distributed according to "
                        "{emission_distribution}".format(
                            emission_distribution=emission_distribution))
        else:
            logger.info("Data to be encoded into {feature_size}-dim "
                        "features.".format(feature_size=feature_size))
            logger.info("Features are assumed to be distributed according "
                        "to {feature_distribution}.".format(
                            feature_distribution=feature_distribution))
            logger.info("Conditioned on the features, data are assumed to "
                        "be distributed according to "
                        "{emission_distribution}".format(
                            emission_distribution=emission_distribution))
        logger.info("Random seed: {seed}".format(seed=seed))
        logger.info("Type of RNN used for the encoder: {rnn_type}".format(
            rnn_type=encoder_rnn_type))
        logger.info("Type of RNN used for the decoder: {rnn_type}".format(
            rnn_type=decoder_rnn_type))
        logger.info("# of RNN hidden layers in the encoder RNN: {hl}".format(
            hl=encoder_rnn_layers))
        logger.info("# of hidden units in the encoder RNNs: {hs}".format(
            hs=encoder_rnn_hidden_size))
        logger.info("# of hidden units in the decoder RNNs: {hs}".format(
            hs=decoder_rnn_hidden_size))
        logger.info("# of hidden units in the MLPs: {hs}".format(
            hs=mlp_hidden_size))
        if latent_type == "abcd":
            # (reference ABCD-VAE/learning.py:103-107)
            if bidirectional_encoder:
                logger.info("Encoder is bidirectional.")
            if bidirectional_decoder:
                logger.info("Decoder is bidirectional.")
        else:
            # (reference plain/learning.py:102-103)
            logger.info("Encoder is bidirectional: "
                        "{bidirectional_encoder}".format(
                            bidirectional_encoder=bidirectional_encoder))
            logger.info("Decoder is bidirectional: "
                        "{bidirectional_decoder}".format(
                            bidirectional_decoder=bidirectional_decoder))
        if bidirectional_decoder:
            logger.info("Probability of emission by the right-to-left "
                        "decoder: {p}".format(p=right2left_decoder_weight))
        logger.info("Dropout rate in the non-top layers of the encoder "
                    "RNN: {do}".format(do=encoder_hidden_dropout))
        logger.info("Self-feedback to the decoder: "
                    "{decoder_self_feedback}".format(
                        decoder_self_feedback=decoder_self_feedback))
        if decoder_self_feedback:
            logger.info("Dropout rate in the input to the decoder RNN: "
                        "{do}".format(do=decoder_input_dropout))
        if encoder_rnn_type == "ESN" or decoder_rnn_type == "ESN":
            logger.info("ESN leak: {leak}".format(leak=esn_leak))
        if speaker_embed_dim is not None:
            logger.info("Speaker ID # is embedded and fed to the decoder.")
            logger.info("# of speakers: {num_speakers}".format(
                num_speakers=num_speakers))
            logger.info("Embedding dimension: {speaker_embed_dim}".format(
                speaker_embed_dim=speaker_embed_dim))

    # ------------------------------------------------------------------
    @staticmethod
    def _pick_device(device: str):
        # local_devices: under multi-host execution jax.devices()[0] is
        # process 0's device — non-addressable from other ranks; staging
        # arrays must live on a device THIS process owns
        if device.startswith("cpu"):
            return jax.local_devices(backend="cpu")[0]
        if device.startswith("cuda"):
            # reference CLI accepts `-d cuda` (learning.py:360); map it to
            # the default accelerator with an explicit notice instead of
            # failing or silently ignoring it
            logger.info("Device 'cuda' requested; using the default "
                        "accelerator {dev} (this is the TPU build)."
                        .format(dev=jax.local_devices()[0]))
        return jax.local_devices()[0]

    def _setup_mesh(self, num_data_partitions: Optional[int]) -> None:
        """Data-parallel mesh over segments (a capability the reference
        lacks; SURVEY.md section 2.4).  Params stay replicated; batches are
        sharded along axis 0; XLA inserts the gradient all-reduce over
        ICI (and over DCN between processes when jax.distributed is
        initialized — parallel/distributed.py)."""
        from ..parallel import mesh as mesh_mod
        if jax.process_count() > 1:
            # every process must participate in one global mesh; a
            # partial mesh would deadlock the collectives
            if (num_data_partitions is not None
                    and num_data_partitions != len(jax.devices())):
                raise ValueError(
                    "--num_data_partitions must equal the global device "
                    f"count ({len(jax.devices())}) under multi-host "
                    "execution")
            self.mesh = mesh_mod.make_mesh(None)
            logger.info(
                "Data-parallel mesh over {n} devices across {p} "
                "processes.".format(n=self.mesh.size,
                                    p=jax.process_count()))
        elif num_data_partitions is not None and num_data_partitions > 1:
            self.mesh = mesh_mod.make_mesh(num_data_partitions)
            logger.info("Data-parallel mesh over {n} devices.".format(
                n=self.mesh.size))
        else:
            self.mesh = None

    def _cache_for(self, dataloader):
        """Build (once per dataset) or fetch the device-resident corpus
        cache for this loader's dataset; None when caching is off,
        meshed/multi-host, or the corpus is too big
        (SEQ2SEQ_DEVICE_CACHE_MAX_BYTES, default 1 GiB)."""
        mode = getattr(self, "device_corpus_cache", "auto")
        if (mode == "off" or getattr(self, "mesh", None) is not None
                or jax.process_count() > 1):
            return None
        ds = dataloader.dataset
        key = id(ds)
        if not hasattr(self, "_device_caches"):
            self._device_caches = {}  # Encoder skips Learner.__init__
        if key not in self._device_caches:
            from ..data import device_cache as dc
            limit = int(os.environ.get("SEQ2SEQ_DEVICE_CACHE_MAX_BYTES",
                                       1 << 30))
            cache = None
            if (mode == "on"
                    or dc.corpus_cache_bytes(ds, dataloader.frontend)
                    <= limit):
                cache = dc.DeviceCorpusCache.build(ds, dataloader.frontend,
                                                   self.device)
            # hold the dataset ref so id() cannot be recycled underneath
            self._device_caches[key] = (ds, cache)
        return self._device_caches[key][1]

    def _batch_stream(self, dataloader, cache):
        """(batch, placed-device-arrays) pairs with the transfer of batch
        i+1 overlapping step i.  With a device corpus cache the epoch's
        index vectors are staged in ONE transfer up front
        (device_cache.stage_epoch) — the tunnel's device_put is
        synchronous, so per-batch index transfers would serialize the
        host loop at one RTT per batch."""
        if cache is None:
            for batch in dataloader:
                yield batch, self._place_batch(batch)
            return
        batches = list(dataloader)  # index-only (skip_audio), cheap
        staged = cache.stage_epoch(batches)
        for batch, pos in zip(batches, staged):
            yield batch, cache.place(batch, pos)

    def _place_batch(self, batch: RawBatch, cache=None):
        """Asynchronously start the host->device transfer (jax.device_put
        returns immediately), so the copy overlaps the previous step's
        execution — the transfer link, not compute, bounds throughput on
        tunneled single-host setups.  With a device-resident corpus cache
        the 'transfer' is a (B,) index vector + an on-device gather."""
        if cache is not None and batch.pos_sorted is not None:
            return cache.place(batch)
        if self.mesh is None:
            return jax.device_put((batch.audio, batch.num_frames,
                                   batch.speakers), self.device)
        from ..parallel import mesh as mesh_mod
        if batch.local_rows is not None:
            # multi-host: this process materialized only its row block;
            # stitch the global sharded arrays without host gathering
            lo, hi = batch.local_rows
            return mesh_mod.shard_batch_arrays_multihost(
                self.mesh, batch.global_rows, batch.audio,
                batch.num_frames[lo:hi], batch.speakers[lo:hi])
        return mesh_mod.shard_batch_arrays(self.mesh, batch.audio,
                                           batch.num_frames, batch.speakers)

    def _replicate_state(self) -> None:
        if self.mesh is None:
            return
        from ..parallel import mesh as mesh_mod
        rep = mesh_mod.replicate(self.mesh)
        tree = (self.params, self.opt_state)
        if jax.process_count() > 1:
            # cross-host device_put accepts host values, not arrays that
            # live on one process's local device; the values are already
            # identical on every process (same seed / same checkpoint)
            tree = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                tree)
        self.params, self.opt_state = jax.device_put(tree, rep)

    @property
    def latent_type(self) -> str:
        return self.model_cfg.latent_type

    def _statics(self, frontend: FrontendSpec, epsilon: float,
                 normalizer: float) -> StepStatics:
        from ..utils.backend_select import SELECTOR
        return StepStatics(self.model_cfg, frontend.frame_length,
                           frontend.step_size, frontend.window, epsilon,
                           normalizer, self.stft_method,
                           rnn_backend=(SELECTOR.current()
                                        if self.device.platform != "cpu"
                                        else "scan"))

    def _temperature(self) -> float:
        if self.latent_type != "abcd":
            return 1.0
        return abcd_mod.temperature_for_iter(self.model_cfg.latent,
                                             int(self.iter_counts))

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _epoch_keys(self, n: int):
        """One split for the whole epoch: one device dispatch instead of
        one per batch (every dispatch pays tunnel latency)."""
        keys = jax.random.split(self.key, n + 1)
        self.key = keys[0]
        if jax.process_count() > 1:
            # per-batch keys must enter the global jit as replicated
            # values, which a process-local device array cannot; host
            # numpy (identical on every process — same seed chain) can
            return np.asarray(keys[1:])
        return keys[1:]

    # ------------------------------------------------------------------
    def train(self, dataloader: DataLoader, statics: StepStatics,
              is_pretraining: bool = False) -> None:
        """One training epoch.

        Pipelined: step i is dispatched asynchronously, batch i+1 is
        assembled and its transfer started while the device runs, and the
        per-batch metric fetches (the only host<->device syncs) are
        deferred to epoch end.  Log-line *contents* match the reference
        exactly (learning.py:179-195); only their timestamps shift.
        """
        emission_loss = 0.0
        end_prediction_loss = 0.0
        kl_loss = 0.0
        num_batches = dataloader.get_num_batches()
        num_strings = len(dataloader.dataset)
        no_sample = bool(is_pretraining and self.latent_type == "abcd")

        pending = []
        cache = self._cache_for(dataloader)
        keys = self._epoch_keys(num_batches)
        k = 0
        for batch, placed in self._batch_stream(dataloader, cache):
            audio, num_frames, speakers = placed
            self.params, self.opt_state, metrics = _train_step(
                self.params, self.opt_state, audio, num_frames,
                speakers, keys[k], float(num_strings),
                self._temperature(), statics=statics, no_sample=no_sample,
                bucket_frames=batch.bucket_frames, tx=self._tx)
            k += 1
            pending.append(metrics)
            if self.latent_type == "abcd" and not is_pretraining:
                self.iter_counts += 1

        for batch_ix, metrics in enumerate(pending, 1):
            emission_loss += float(metrics["emission_loss"])
            end_prediction_loss += float(metrics["offset_loss"])
            kl_loss += float(metrics["kl_loss"])
            if self.latent_type == "abcd":
                logger.info(
                    "{batch_ix}/{num_batches} training batches complete. "
                    "mean loss: {loss:5.4f}. Perplexity of the posterior "
                    "clustering probs.: {cluster_perplex:5.4f}. Perplexity "
                    "of the mean clustering probs. over minibatch: "
                    "{batch_perplex:5.4f}. Perplexity of the posterior "
                    "Dirichlet shape: {shape_perplex:5.4f}".format(
                        batch_ix=batch_ix, num_batches=num_batches,
                        loss=float(metrics["loss"]),
                        shape_perplex=float(
                            metrics["posterior_shape_perplex"]),
                        batch_perplex=float(metrics["batch_perplex"]),
                        cluster_perplex=float(
                            metrics["clustering_perplex"])))
            else:
                logger.info(
                    "{batch_ix}/{num_batches} training batches complete. "
                    "mean loss: {loss:5.4f}".format(
                        batch_ix=batch_ix, num_batches=num_batches,
                        loss=float(metrics["loss"])))

        emission_loss /= num_strings
        end_prediction_loss /= num_strings
        kl_loss /= num_strings
        mean_loss = emission_loss + end_prediction_loss + kl_loss
        logger.info("mean training emission negative pdf loss (per string): "
                    "{:5.4f}".format(emission_loss))
        logger.info("mean training end-prediction loss (per string): "
                    "{:5.4f}".format(end_prediction_loss))
        logger.info("mean training KL (per string): {:5.4f}".format(kl_loss))
        logger.info("mean training total loss (per string): "
                    "{:5.4f}".format(mean_loss))
        self.epoch_init_iter_counts = self.iter_counts

    def test_or_validate(self, dataloader: DataLoader, statics: StepStatics,
                         is_pretraining: bool = False) -> float:
        emission_loss = 0.0
        end_prediction_loss = 0.0
        kl_loss = 0.0
        num_batches = dataloader.get_num_batches()
        num_strings = len(dataloader.dataset)

        no_sample = bool(is_pretraining and self.latent_type == "abcd")
        pending = []
        cache = self._cache_for(dataloader)
        keys = self._epoch_keys(num_batches)
        k = 0
        for batch, placed in self._batch_stream(dataloader, cache):
            audio, num_frames, speakers = placed
            metrics = _eval_step(
                self.params, audio, num_frames, speakers,
                keys[k], float(num_strings), self._temperature(),
                statics=statics, no_sample=no_sample,
                bucket_frames=batch.bucket_frames)
            k += 1
            pending.append(metrics)
        for batch_ix, metrics in enumerate(pending, 1):
            emission_loss += float(metrics["emission_loss"])
            end_prediction_loss += float(metrics["offset_loss"])
            kl_loss += float(metrics["kl_loss"])
            logger.info("{batch_ix}/{num_batches} validation batches "
                        "complete.".format(batch_ix=batch_ix,
                                           num_batches=num_batches))

        emission_loss /= num_strings
        end_prediction_loss /= num_strings
        kl_loss /= num_strings
        mean_loss = emission_loss + end_prediction_loss + kl_loss
        logger.info("mean validation emission negative pdf loss (per "
                    "string): {:5.4f}".format(emission_loss))
        logger.info("mean validation end-prediction loss (per string): "
                    "{:5.4f}".format(end_prediction_loss))
        logger.info("mean validation KL (per string): "
                    "{:5.4f}".format(kl_loss))
        logger.info("mean validation total loss (per string): "
                    "{:5.4f}".format(mean_loss))
        return mean_loss

    # ------------------------------------------------------------------
    def learn(self, train_dataset, valid_dataset, num_epochs,
              batch_size_train, batch_size_valid, frontend: FrontendSpec,
              epsilon: float = 2.0 ** -15, data_normalizer: float = 1.0,
              pretrain_epochs: int = 0, learning_rate: float = 0.1,
              momentum: float = 0.9, gradient_clip: float = 0.25,
              patience: int = 0) -> None:
        mode = getattr(self, "batching_mode", "bucket_shuffled")
        # Only a device mesh needs row-count divisibility; off-mesh the
        # last partial batch runs at its true size (one extra compiled
        # program per bucket instead of up to B-1 wasted padding rows).
        pad_b = self.mesh is not None
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        train_dataloader = DataLoader(train_dataset, frontend,
                                      batch_size=batch_size_train,
                                      shuffle=True, batching_mode=mode,
                                      pad_to_batch_size=pad_b,
                                      process_shard=shard)
        # eval order is loss-irrelevant (sum-reduced); group by length
        # for minimal padding unless exact reference iteration was asked
        valid_dataloader = DataLoader(valid_dataset, frontend,
                                      batch_size=batch_size_valid,
                                      batching_mode=("uniform" if
                                                     mode == "uniform"
                                                     else "length_sorted"),
                                      pad_to_batch_size=pad_b,
                                      process_shard=shard)
        # device-resident corpus cache: host assembly is skipped and the
        # loaders yield index-only batches (data/device_cache.py)
        for dl in (train_dataloader, valid_dataloader):
            if self._cache_for(dl) is not None:
                dl.skip_audio = True
        statics = self._statics(frontend, epsilon, data_normalizer)

        if self.retrieval:
            initial_epoch = self.last_epoch + 1
            logger.info("To be restarted from the beginning of epoch #: "
                        "{epoch}".format(epoch=initial_epoch))
            self.gradient_clip = self.checkpoint["gradient_clip"]
            momentum = self.checkpoint.get("momentum", momentum)
            self._momentum = momentum
            self._tx = optim.make_optimizer(learning_rate, momentum,
                                            self.gradient_clip)
            saved_opt = self.checkpoint.get("optimizer")
            if saved_opt is None:
                # imported torch checkpoint: fresh optimizer state
                self.opt_state = self._tx.init(self.params)
            elif isinstance(saved_opt, ckpt.OptimizerLeaves):
                # v2 container: leaves only; rebuild the optax tree
                # structure from a fresh init (same momentum/clip, so the
                # structures match; see train/checkpoint.py docstring)
                template = self._tx.init(self.params)
                self.opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(template),
                    [jax.device_put(leaf, self.device)
                     for leaf in saved_opt.leaves])
            else:  # round-1 pickle format: the full pytree was stored
                self.opt_state = ckpt.tree_to_device(saved_opt, self.device)
            self.lr_scheduler = optim.ReduceLROnPlateau()
            self.lr_scheduler.load_state_dict(
                self.checkpoint["lr_scheduler"])
            self._replicate_state()
        else:
            self.gradient_clip = gradient_clip
            self._momentum = momentum
            self._tx = optim.make_optimizer(learning_rate, momentum,
                                            gradient_clip)
            self.opt_state = self._tx.init(self.params)
            self._replicate_state()
            self.lr_scheduler = optim.ReduceLROnPlateau(patience=patience)
            logger.info("START LEARNING.")
            logger.info("max # of epochs: {ep}".format(ep=num_epochs))
            if self.latent_type == "abcd":
                logger.info("first {} epochs are for pretraining w/o "
                            "gumbel-softmax sampling.".format(
                                pretrain_epochs))
            logger.info("batch size for training data: {size}".format(
                size=batch_size_train))
            logger.info("batch size for validation data: {size}".format(
                size=batch_size_valid))
            logger.info("initial learning rate: {lr}".format(
                lr=learning_rate))
            logger.info("momentum for SGD: {momentum}".format(
                momentum=momentum))
            logger.info("gradient clipping: {gc}".format(
                gc=self.gradient_clip))
            initial_epoch = 1

        profiling = False
        for epoch in range(initial_epoch, num_epochs + 1):
            if epoch > initial_epoch and self.device.platform != "cpu":
                # The tunnel's pallas dispatch latency drifts within one
                # session (BASELINE.md: 0.13-3.1 ms observed); re-probe
                # with hysteresis at each epoch boundary and log the
                # decision.  A switch changes statics.rnn_backend, so the
                # next dispatch retraces onto the other kernel path.
                from ..utils.backend_select import SELECTOR
                prev_backend = statics.rnn_backend
                choice = SELECTOR.maybe_reprobe(context=f"epoch {epoch}")
                if SELECTOR.decisions:
                    d = SELECTOR.decisions[-1]
                    logger.info(
                        "Kernel backend decision: {b} (dispatch {ms} ms)"
                        "{sw}".format(
                            b=d["backend"], ms=d["dispatch_ms"],
                            sw=(" -- SWITCHED from %s" % prev_backend)
                            if d["switched"] else ""))
                if choice != prev_backend:
                    statics = dataclass_replace(statics,
                                                rnn_backend=choice)
            if self.profile_dir and epoch == initial_epoch + 1:
                # Trace the second epoch (first is compile-dominated);
                # the reference has no profiler at all (SURVEY.md section 5).
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
                logger.info("jax.profiler trace started -> {d}".format(
                    d=self.profile_dir))
            logger.info("START OF EPOCH: {:3d}".format(epoch))
            logger.info("current learning rate: {lr}".format(
                lr=optim.get_learning_rate(self.opt_state)))
            is_pretrain = (self.latent_type == "abcd"
                           and epoch <= pretrain_epochs)

            logger.info("start of TRAINING phase.")
            self.train(train_dataloader, statics, is_pretrain)
            logger.info("end of TRAINING phase.")

            logger.info("start of VALIDATION phase.")
            mean_valid_loss = self.test_or_validate(valid_dataloader,
                                                    statics, is_pretrain)
            logger.info("end of VALIDATION phase.")

            new_lr = self.lr_scheduler.step(
                mean_valid_loss, optim.get_learning_rate(self.opt_state))
            self.opt_state = optim.with_learning_rate(self.opt_state, new_lr)
            if self.latent_type == "abcd" and epoch == pretrain_epochs:
                self.lr_scheduler.reset_best()
                logger.info("END OF PRETRAINING.")
            self.save_model(epoch)
            logger.info("END OF EPOCH: {:3d}".format(epoch))
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("jax.profiler trace stopped.")

        self._checkpointer.wait()
        logger.info("END OF TRAINING")

    # ------------------------------------------------------------------
    def save_model(self, epoch: int) -> None:
        if jax.process_count() > 1 and jax.process_index() != 0:
            # state is replicated bit-identically; process 0 owns the
            # filesystem (parallel/distributed.py)
            return
        latent_init = self.model_cfg.latent.pack_init_parameters()
        if self.latent_type == "abcd":
            latent_init["epoch_init_iter_counts"] = (
                self.epoch_init_iter_counts)
        payload = {
            "epoch": epoch,
            "latent_type": self.latent_type,
            "encoder": ckpt.tree_to_numpy(self.params["encoder"]),
            "encoder_init_parameters":
                self.model_cfg.encoder.pack_init_parameters(),
            "feature_sampler":
                ckpt.tree_to_numpy(self.params["feature_sampler"]),
            "feature_sampler_init_parameters": latent_init,
            "decoder": ckpt.tree_to_numpy(self.params["decoder"]),
            "decoder_init_parameters":
                self.model_cfg.decoder.pack_init_parameters(),
            "optimizer": ckpt.tree_to_numpy(self.opt_state),
            "momentum": getattr(self, "_momentum", 0.0),
            "lr_scheduler": self.lr_scheduler.state_dict(),
            "gradient_clip": self.gradient_clip,
            "random_state": np.asarray(self.key),
        }
        self._checkpointer.save(self.save_dir, payload)
        logger.info("Config successfully saved.")

    def retrieve_model(self, checkpoint_path: Optional[str] = None,
                       device: str = "", strict: bool = True) -> int:
        """Rebuild the model from the self-describing checkpoint.

        The encoder is always loaded tolerantly — the reference's
        ``load_state_dict(..., strict=False)`` (learning.py:325) — and
        the other modules tolerantly when ``strict=False``: missing
        entries keep their fresh initialization, unexpected entries are
        dropped, both with a logged warning (schema-drift path).
        """
        if checkpoint_path is None:
            checkpoint_path = os.path.join(self.save_dir,
                                           ckpt.CHECKPOINT_NAME)
        self.checkpoint = ckpt.load_checkpoint(checkpoint_path)
        c = self.checkpoint

        enc_cfg = EncoderConfig.from_init_parameters(
            c["encoder_init_parameters"])
        latent_init = dict(c["feature_sampler_init_parameters"])
        if c.get("latent_type", "abcd") == "abcd":
            latent_cfg = ABCDSamplerConfig.from_init_parameters(latent_init)
            self.iter_counts = latent_cfg.epoch_init_iter_counts
            self.epoch_init_iter_counts = latent_cfg.epoch_init_iter_counts
        else:
            latent_cfg = GaussianSamplerConfig.from_init_parameters(
                latent_init)
            self.iter_counts = 0
            self.epoch_init_iter_counts = 0
        dec_cfg = DecoderConfig.from_init_parameters(
            c["decoder_init_parameters"])
        self.model_cfg = vae.ModelConfig(enc_cfg, latent_cfg, dec_cfg)
        with jax.default_device(self.device):
            template = vae.model_init(jax.random.PRNGKey(0), self.model_cfg)
        merged = {
            "encoder": ckpt.overlay_params(
                template["encoder"], c["encoder"], "encoder",
                strict=False, log=logger),
            "feature_sampler": ckpt.overlay_params(
                template["feature_sampler"], c["feature_sampler"],
                "feature_sampler", strict=strict, log=logger),
            "decoder": ckpt.overlay_params(
                template["decoder"], c["decoder"], "decoder",
                strict=strict, log=logger),
        }
        self.params = ckpt.tree_to_device(merged, self.device)
        self.gradient_clip = c["gradient_clip"]
        self.key = jnp.asarray(c["random_state"])
        return c["epoch"]
