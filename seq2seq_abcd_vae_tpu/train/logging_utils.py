"""history.log setup; the log file doubles as the resume marker.

Reference: update_log_handler, ABCD-VAE/learning.py:12-32.  Same file name,
same '{asctime} - {levelname} - {message}' format, same coupling: an
existing history.log flips the Learner into retrieval mode.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("seq2seq_abcd_vae_tpu")


def update_log_handler(file_dir: str,
                       primary: bool = True) -> tuple[bool, str]:
    """primary=False (non-zero multi-host ranks): no file handler is
    attached — history.log is written (and the resume marker created) by
    process 0 only; retrieval detection still reads the shared file."""
    for h in logger.handlers[:]:
        logger.removeHandler(h)
    log_file_path = os.path.join(file_dir, "history.log")
    retrieval = os.path.isfile(log_file_path)
    # Multi-host: EVERY rank must observe the same marker state, but the
    # primary's FileHandler below CREATES the file.  Without a barrier
    # between "all ranks stat" and "rank 0 creates", a non-primary rank
    # statting microseconds after rank 0 attached its handler would flip
    # into resume mode on a fresh run and die loading a checkpoint that
    # does not exist (observed as a startup race: rank 1 crash -> rank 0
    # hung in its first collective -> shutdown-barrier timeout).
    from ..parallel.distributed import sync_processes
    sync_processes("history-log-stat")
    if not primary:
        logger.addHandler(logging.NullHandler())
        return retrieval, log_file_path
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
