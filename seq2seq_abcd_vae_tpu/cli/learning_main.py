"""Training entry point shared by the abcd and plain CLIs.

Mirrors the reference __main__ flows (ABCD-VAE/learning.py:406-493,
plain/learning.py:384-447): save-dir layout, speaker_coding.json
persistence (abcd), derived STFT geometry, decoder-RNN default, derived
model input_size, validation batch default.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..data.annotations import AnnotationParser
from ..data.batching import FrontendSpec
from ..train.learner import Learner
from ..train.logging_utils import logger
from . import flags


def get_save_dir(save_root: str, job_id_str: str) -> str:
    save_dir = os.path.join(save_root, job_id_str)
    if not os.path.isdir(save_dir):
        os.makedirs(save_dir)
    return save_dir


def main(variant: str, argv=None) -> None:
    parameters = flags.build_learning_parser(variant).parse_args(argv)
    from ..utils import (enable_persistent_compilation_cache,
                         select_platforms)
    select_platforms(parameters.device)  # before any backend touch
    from ..parallel.distributed import (is_primary,
                                        maybe_initialize_distributed)
    maybe_initialize_distributed()  # no-op unless the multi-host env is set
    enable_persistent_compilation_cache()

    save_root = parameters.save_root
    if save_root is None:
        save_root = parameters.input_root
    save_dir = get_save_dir(save_root, parameters.job_id)

    speaker2ix = None
    speaker_coding_path = os.path.join(save_dir, "speaker_coding.json")
    if variant == "abcd" and os.path.isfile(speaker_coding_path):
        with open(speaker_coding_path, "r") as f:
            speaker2ix = json.load(f)

    data_parser = AnnotationParser(parameters.input_root,
                                   parameters.annotation_file,
                                   annotation_sep=parameters.annotation_sep,
                                   speaker2ix=speaker2ix)
    # All wav files are assumed to share the first file's fs.
    fs = data_parser.get_sample_freq()
    num_speakers = data_parser.get_num_speakers()
    if (variant == "abcd" and num_speakers > 0 and speaker2ix is None
            and is_primary()):
        with open(speaker_coding_path, "w") as f:
            json.dump(data_parser.speaker2ix, f)

    fft_frame_length = int(np.floor(parameters.fft_frame_length * fs))
    fft_step_size = int(np.floor(parameters.fft_step_size * fs))

    if parameters.decoder_rnn_type is None:
        parameters.decoder_rnn_type = parameters.encoder_rnn_type

    common = dict(
        input_size=int(fft_frame_length / 2 + 1),
        encoder_rnn_hidden_size=parameters.encoder_rnn_hidden_size,
        decoder_rnn_hidden_size=parameters.decoder_rnn_hidden_size,
        mlp_hidden_size=parameters.mlp_hidden_size,
        save_dir=save_dir,
        encoder_rnn_type=parameters.encoder_rnn_type,
        decoder_rnn_type=parameters.decoder_rnn_type,
        encoder_rnn_layers=parameters.encoder_rnn_layers,
        encoder_hidden_dropout=parameters.encoder_hidden_dropout,
        decoder_input_dropout=parameters.decoder_input_dropout,
        device=parameters.device,
        seed=parameters.seed,
        decoder_self_feedback=not parameters.greedy_decoder,
        bidirectional_encoder=not parameters.unidirectional_encoder,
        bidirectional_decoder=parameters.bidirectional_decoder,
        right2left_decoder_weight=parameters.right2left_decoder_weight,
        esn_leak=parameters.esn_leak,
        num_speakers=num_speakers if num_speakers > 0 else None,
        speaker_embed_dim=parameters.speaker_embed_dim,
        matmul_precision=parameters.matmul_precision,
        stft_method=parameters.stft_method,
        num_data_partitions=parameters.num_data_partitions,
        profile_dir=parameters.profile_dir,
        length_sorted_batches=parameters.length_sorted_batches,
        batching_mode=parameters.batching_mode,
        device_corpus_cache=parameters.device_corpus_cache,
    )
    if variant == "abcd":
        learner = Learner(
            latent_type="abcd",
            num_feature_categories=parameters.num_feature_categories,
            feature_dim=parameters.feature_dim,
            prior_concentration=parameters.prior_concentration,
            **common)
    else:
        learner = Learner(latent_type="gaussian",
                          feature_size=parameters.feature_size, **common)

    frontend = FrontendSpec(fft_frame_length, fft_step_size,
                            centering=not parameters.fft_no_centering,
                            window=parameters.fft_window_type)
    logger.info("log(abs(STFT(wav))) + {eps}) / {normalizer} will be the "
                "input.".format(eps=parameters.epsilon,
                                normalizer=parameters.data_normalizer))
    logger.info("Sampling frequency of data: {fs}".format(fs=fs))
    logger.info("STFT window type: {fft_window}".format(
        fft_window=parameters.fft_window_type))
    logger.info("STFT frame lengths: {fft_frame_length_in_sec} sec".format(
        fft_frame_length_in_sec=parameters.fft_frame_length))
    logger.info("STFT step size: {fft_step_size_in_sec} sec".format(
        fft_step_size_in_sec=parameters.fft_step_size))

    train_dataset = data_parser.get_data(data_type="train",
                                         channel=parameters.channel)
    valid_dataset = data_parser.get_data(data_type="valid",
                                         channel=parameters.channel)

    if parameters.validation_batch_size is None:
        parameters.validation_batch_size = parameters.batch_size

    learn_kwargs = dict(
        frontend=frontend,
        epsilon=parameters.epsilon,
        data_normalizer=parameters.data_normalizer,
        learning_rate=parameters.learning_rate,
        momentum=parameters.momentum,
        gradient_clip=parameters.clip,
        patience=parameters.patience,
    )
    if variant == "abcd":
        learn_kwargs["pretrain_epochs"] = parameters.pretrain_epochs
    learner.learn(train_dataset, valid_dataset, parameters.epochs,
                  parameters.batch_size, parameters.validation_batch_size,
                  **learn_kwargs)
