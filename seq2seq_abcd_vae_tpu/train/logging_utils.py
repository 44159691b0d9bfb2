"""history.log setup; the log file doubles as the resume marker.

Reference: update_log_handler, ABCD-VAE/learning.py:12-32.  Same file name,
same '{asctime} - {levelname} - {message}' format, same coupling: an
existing history.log flips the Learner into retrieval mode.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("seq2seq_abcd_vae_tpu")


def update_log_handler(file_dir: str) -> tuple[bool, str]:
    for h in logger.handlers[:]:
        logger.removeHandler(h)
    log_file_path = os.path.join(file_dir, "history.log")
    retrieval = os.path.isfile(log_file_path)
    handler = logging.FileHandler(filename=log_file_path)
    handler.setLevel(logging.DEBUG)
    handler.setFormatter(logging.Formatter(
        "{asctime} - {levelname} - {message}", style="{"))
    logger.setLevel(logging.DEBUG)
    logger.addHandler(handler)
    if retrieval:
        logger.info("LEARNING RETRIEVED.")
    else:
        import jax
        logger.info("Logger set up.")
        logger.info("JAX ver.: {ver}".format(ver=jax.__version__))
    return retrieval, log_file_path
