#!/usr/bin/env python
# coding: utf-8
"""Persistent encode server (extension; the reference has no serving).

Keeps the checkpoint resident and answers NDJSON encode requests over a
Unix socket with dynamic micro-batching; implementation lives in the
seq2seq_abcd_vae_tpu package.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

from seq2seq_abcd_vae_tpu.cli.serve_main import main

if __name__ == "__main__":
    main()
