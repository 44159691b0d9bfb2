#!/usr/bin/env python
# coding: utf-8
"""Train the plain Gaussian seq2seq VAE (TPU-native).

Drop-in CLI for the reference script of the same path; implementation
lives in the seq2seq_abcd_vae_tpu package.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

from seq2seq_abcd_vae_tpu.cli.learning_main import main

if __name__ == "__main__":
    main("plain")
