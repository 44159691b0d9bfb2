"""Subprocess worker for tests/test_multihost.py.

Runs the real training CLI under a 2-process virtual-CPU mesh.  NOT a
pytest file (no test_ prefix): launched via subprocess with the
multi-host env (SEQ2SEQ_COORDINATOR_ADDRESS & co.) already set by the
parent, plus XLA_FLAGS forcing 4 virtual CPU devices per process.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)


def main():
    save_root = sys.argv[1]
    toy_root = sys.argv[2]
    ann = sys.argv[3]
    epochs = sys.argv[4] if len(sys.argv) > 4 else "2"
    partitions = sys.argv[5] if len(sys.argv) > 5 else "8"
    batch = sys.argv[6] if len(sys.argv) > 6 else "8"
    from seq2seq_abcd_vae_tpu.cli.learning_main import main as learn_main

    learn_main("abcd", [
        toy_root, ann, "-S", save_root, "-j", "mh", "-e", epochs,
        "--pretrain_epochs", "1", "-b", batch, "-K", "4", "-f", "8",
        "--encoder_rnn_hidden_size", "16", "--decoder_rnn_hidden_size",
        "16", "--mlp_hidden_size", "16", "-N", "11.0", "-d", "cpu",
        "--num_data_partitions", partitions])


if __name__ == "__main__":
    main()
