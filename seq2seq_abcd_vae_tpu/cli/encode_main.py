"""Encoding entry point shared by the four encode CLIs.

Mirrors ABCD-VAE/encode.py:83-108 (mode='probs'), encode_logit.py
(mode='logits'), encode_features.py (mode='features') and
plain/encode.py:75-108 (mode='params')."""

from __future__ import annotations

import os

import numpy as np

from ..data.annotations import AnnotationParser
from ..data.batching import FrontendSpec
from ..infer.encode import Encoder
from . import flags


def main(mode: str, argv=None) -> None:
    variant = "plain" if mode == "params" else "abcd"
    parameters = flags.build_encode_parser(variant).parse_args(argv)
    from ..utils import (enable_persistent_compilation_cache,
                         select_platforms)
    select_platforms(parameters.device)  # before any backend touch
    enable_persistent_compilation_cache()

    save_path = parameters.save_path
    if save_path is None:
        save_path = os.path.join(parameters.input_root, "autoencoded.csv")
    save_dir = os.path.dirname(save_path)
    if save_dir and not os.path.isdir(save_dir):
        os.makedirs(save_dir)

    data_parser = AnnotationParser(parameters.input_root,
                                   parameters.annotation_file,
                                   annotation_sep=parameters.annotation_sep)
    fs = data_parser.get_sample_freq()

    fft_frame_length = int(np.floor(parameters.fft_frame_length * fs))
    fft_step_size = int(np.floor(parameters.fft_step_size * fs))

    encoder = Encoder(parameters.model_path, device=parameters.device,
                      matmul_precision=parameters.matmul_precision,
                      stft_method=parameters.stft_method)

    frontend = FrontendSpec(fft_frame_length, fft_step_size,
                            centering=not parameters.fft_no_centering,
                            window=parameters.fft_window_type)
    dataset = data_parser.get_data(channel=parameters.channel)

    if parameters.save_format == "npz":
        encoder.encode_dataset_npz(dataset, save_path, frontend,
                                   parameters.epsilon,
                                   parameters.data_normalizer, mode=mode,
                                   batch_size=parameters.batch_size)
        return

    if mode == "params":
        if parameters.parameter_names is None:
            parameter_ix2name = {}
        else:
            parameter_ix2name = dict(
                enumerate(parameters.parameter_names.split(",")))
        df_encoded = encoder.encode_dataset_params(
            dataset, frontend, parameters.epsilon,
            parameters.data_normalizer, parameter_ix2name=parameter_ix2name,
            batch_size=parameters.batch_size)
        df_encoded = df_encoded.sort_values(
            ["data_ix", "parameter_name", "feature_dim"])
        if "label" in data_parser.df_annotation.columns:
            df_encoded = df_encoded.merge(data_parser.df_annotation,
                                          how="left", left_on="data_ix",
                                          right_index=True)
        df_encoded.to_csv(save_path, index=False)
    else:
        encoder.encode_dataset(dataset, save_path, frontend,
                               parameters.epsilon,
                               parameters.data_normalizer, mode=mode,
                               batch_size=parameters.batch_size)
