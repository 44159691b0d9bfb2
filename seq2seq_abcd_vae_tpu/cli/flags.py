"""Argparse builders.

Flag names, defaults and help strings match the reference byte-for-byte
(ABCD-VAE/learning.py:351-394, plain/learning.py:326-367,
ABCD-VAE/encode.py:63-81, plain/encode.py:54-73); TPU-specific additions
are grouped at the end and are strictly new flags.
"""

from __future__ import annotations

import argparse

EPSILON_DEFAULT = 2.0 ** -15


def _tpu_extras(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("TPU options (extensions over the reference)")
    g.add_argument("--matmul_precision", type=str, default="highest",
                   choices=["highest", "float32", "bfloat16_3x", "default",
                            "bfloat16"],
                   help="JAX default matmul precision. 'highest' keeps "
                        "float32 MXU passes for reference parity; "
                        "'default' allows bf16 for speed.")
    g.add_argument("--stft_method", type=str, default="fft",
                   choices=["fft", "matmul", "pallas"],
                   help="STFT frontend implementation: XLA rfft, windowed "
                        "DFT matmuls, or the fused Pallas kernel.")
    g.add_argument("--num_data_partitions", type=int, default=None,
                   help="Shard batches over this many devices along a "
                        "('data',) mesh. Default: all visible devices when "
                        ">1, else single-device.")
    g.add_argument("--length_sorted_batches", action="store_true",
                   help="Group length-similar segments into batches "
                        "(smallest possible padded bucket per batch; "
                        "changes batch composition vs the reference's "
                        "uniform draws).")
    g.add_argument("--batching_mode", type=str, default=None,
                   choices=["uniform", "bucket_shuffled", "length_sorted"],
                   help="Training batch composition: 'bucket_shuffled' "
                        "(default; shuffled within length buckets, "
                        "bucket-homogeneous batches, minimal padding), "
                        "'uniform' (the reference's uniform-draw semantics "
                        "— uniform shuffle, end-consumed batches — with "
                        "numpy RNG, not its literal torch draw sequence), or "
                        "'length_sorted' (global sort, = "
                        "--length_sorted_batches).")
    g.add_argument("--profile_dir", type=str, default=None,
                   help="If set, capture a jax.profiler trace of one "
                        "steady-state epoch into this directory.")
    g.add_argument("--save_format", type=str, default="csv",
                   choices=["csv", "npz"],
                   help="Encode result format: 'csv' (the reference's "
                        "long-format layout, byte-identical) or 'npz' "
                        "(binary sidecar: data_ix plus the dense value "
                        "matrix; ~40x smaller parse cost downstream). "
                        "Training CLIs ignore this flag.")
    g.add_argument("--device_corpus_cache", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Keep the corpus device-resident and assemble "
                        "batches on-device (per-batch transfer becomes a "
                        "(B,) index vector). 'auto' enables it when "
                        "single-process and the corpus is under "
                        "SEQ2SEQ_DEVICE_CACHE_MAX_BYTES (default 1 GiB).")


def build_learning_parser(variant: str) -> argparse.ArgumentParser:
    assert variant in ("abcd", "plain")
    p = argparse.ArgumentParser()
    a = p.add_argument
    a("input_root", type=str,
      help="Path to the root directory under which inputs are located.")
    a("annotation_file", type=str,
      help="Path to the annotation csv file.")
    a("--annotation_sep", type=str, default=",",
      help='Separator symbol of the annotation file. Comma "," by default '
           "(i.e., csv).")
    a("-S", "--save_root", type=str, default=None,
      help="Path to the directory where results are saved.")
    a("-j", "--job_id", type=str, default="NO_JOB_ID",
      help="Job ID. For users of computing clusters.")
    a("-s", "--seed", type=int, default=1111, help="random seed")
    a("-d", "--device", type=str, default="cpu", help="Computing device.")
    a("-e", "--epochs", type=int, default=20,
      help="# of epochs to train the model.")
    if variant == "abcd":
        a("--pretrain_epochs", type=int, default=5,
          help="# of initial epochs to pretrain the model w/o "
               "gumbel-softmax sampling.")
    a("-b", "--batch_size", type=int, default=512,
      help="Batch size for training.")
    a("--validation_batch_size", type=int, default=None,
      help="Batch size for validation. Same as for training by default.")
    a("-l", "--learning_rate", type=float, default=1.0,
      help="Initial learning rate.")
    a("-M", "--momentum", type=float, default=0.0,
      help="Momentum for the storchastic gradient descent.")
    a("-c", "--clip", type=float, default=1.0, help="Gradient clipping.")
    a("-p", "--patience", type=int, default=0,
      help="# of epochs before updating the learning rate.")
    a("-R", "--encoder_rnn_type", type=str, default="LSTM",
      help="Name of RNN to be used for the encoder.")
    a("--decoder_rnn_type", type=str, default=None,
      help="Name of RNN to be used for the decoder. Same as the encoder "
           "by default.")
    if variant == "abcd":
        a("-K", "--num_feature_categories", type=int, default=128,
          help="# of possible discrete values token on by latent features "
               "into which data are encoded.")
        a("-f", "--feature_dim", type=int, default=256,
          help="# of dimensions of features into which the discrete "
               "feature are linear-transformed.")
    else:
        a("-f", "--feature_size", type=int, default=16,
          help="# of dimensions of features into which data are encoded.")
    a("--encoder_rnn_layers", type=int, default=1,
      help="# of hidden layers in the encoder RNN.")
    a("--encoder_rnn_hidden_size", type=int, default=256,
      help="# of the RNN units in the encoder RNN.")
    a("--decoder_rnn_hidden_size", type=int, default=256,
      help="# of the RNN units in the decoder RNN.")
    a("--mlp_hidden_size", type=int, default=256,
      help="# of neurons in the hidden layer of the MLP transforms.")
    a("--speaker_embed_dim", type=int, default=None,
      help="If specified, the decoder receives an embedding of the speaker "
           "ID with the specified dim. No embedding by default.")
    a("--encoder_hidden_dropout", type=float, default=0.0,
      help="Dropout rate in the non-top layers of the encoder RNN.")
    a("--decoder_input_dropout", type=float, default=0.0,
      help="Dropout rate in the input to the decoder RNN.")
    a("--greedy_decoder", action="store_true",
      help="If selected, decoder becomes greedy and will not receive "
           "self-feedback.")
    a("--esn_leak", type=float, default=1.0,
      help="Leak for the echo-state network. Ignored if the RNN type is "
           "not ESN.")
    a("--unidirectional_encoder", action="store_true",
      help="If selected, the RNN encoder is unidirectional.")
    a("--bidirectional_decoder", action="store_true",
      help="If selected, use the weighted sum of losses from left-to-right "
           "and right-to-left decoders (to avoid the uninformative latent "
           "variable problem).")
    a("--right2left_decoder_weight", type=float, default=0.5,
      help="The weight of the right-to-left decoder when "
           "bidirectional_decoder==True.")
    a("--fft_frame_length", type=float, default=0.008,
      help="FFT frame length in sec.")
    a("--fft_step_size", type=float, default=0.004,
      help="FFT step size in sec.")
    a("--fft_window_type", type=str, default="hann_window",
      help='Window type for FFT. "hann_window" by default.')
    a("--fft_no_centering", action="store_true",
      help="If selected, no centering in FFT.")
    a("--channel", type=int, default=0,
      help="Channel ID # (starting from 0) of multichannel recordings "
           "to use.")
    a("-N", "--data_normalizer", type=float, default=1.0,
      help="Normalizing constant to devide the data.")
    a("-E", "--epsilon", type=float, default=EPSILON_DEFAULT,
      help="Small positive real number to add to avoid log(0).")
    if variant == "abcd":
        a("--prior_concentration", type=float, default=1.0,
          help="Concentration of the Dirichlet prior on the probability "
               "of the discrete feature.")
    _tpu_extras(p)
    return p


def build_encode_parser(variant: str) -> argparse.ArgumentParser:
    assert variant in ("abcd", "plain")
    p = argparse.ArgumentParser()
    a = p.add_argument
    a("model_path", type=str,
      help="Path to the configuration file of a trained model.")
    a("input_root", type=str,
      help="Path to the root directory under which inputs are located.")
    a("annotation_file", type=str,
      help="Path to the annotation csv file.")
    a("data_normalizer", type=float,
      help="Normalizing constant to devide the data.")
    a("--annotation_sep", type=str, default=",",
      help='Separator symbol of the annotation file. Comma "," by default '
           "(i.e., csv).")
    a("-d", "--device", type=str, default="cpu", help="Computing device.")
    a("-S", "--save_path", type=str, default=None,
      help="Path to the file where results are saved.")
    a("--fft_frame_length", type=float, default=0.008,
      help="FFT frame length in sec.")
    a("--fft_step_size", type=float, default=0.004,
      help="FFT step size in sec.")
    a("--fft_window_type", type=str, default="hann_window",
      help='Window type for FFT. "hann_window" by default.')
    a("--fft_no_centering", action="store_true",
      help="If selected, no centering in FFT.")
    a("--channel", type=int, default=0,
      help="Channel ID # (starting from 0) of multichannel recordings "
           "to use.")
    if variant == "plain":
        a("-p", "--parameter_names", type=str, default=None,
          help="Comma-separated parameter names.")
    a("-E", "--epsilon", type=float, default=EPSILON_DEFAULT,
      help="Small positive real number to add to avoid log(0).")
    a("-b", "--batch_size", type=int, default=1, help="Batch size.")
    _tpu_extras(p)
    return p
