"""Multi-host (multi-process) runtime entry.

The reference is strictly single-process (learning.py:360's single `-d`
flag; SURVEY.md section 2.4).  The TPU-native capability superset adds
gradient all-reduce over ICI *within* a pod slice and DCN *across*
processes: each host process drives its local chips, the global
``('data',)`` mesh spans every process, and XLA inserts the cross-host
collectives.

Environment contract (set by the launcher on every process):

    SEQ2SEQ_COORDINATOR_ADDRESS   host:port of process 0
    SEQ2SEQ_NUM_PROCESSES         total process count
    SEQ2SEQ_PROCESS_ID            this process's rank (0-based)

``maybe_initialize_distributed()`` is a no-op when the address is unset,
so single-process behavior is unchanged.  It must run before any JAX
backend initializes (the CLI mains call it first thing).

Per-process data loading: every process computes the identical batch
COMPOSITION (numpy RNG from the shared seed) but materializes only its
own row shard (``DataLoader(process_shard=...)``); the global on-device
batch is assembled by ``jax.make_array_from_process_local_data`` in
``mesh.shard_batch_arrays_multihost``.  Checkpoints/history.log are
written by process 0 only (shared-filesystem assumption, like every
torch.distributed setup).
"""

from __future__ import annotations

import os


def multihost_env() -> tuple[str, int, int] | None:
    """The (address, num_processes, process_id) triple, or None."""
    addr = os.environ.get("SEQ2SEQ_COORDINATOR_ADDRESS")
    if not addr:
        return None
    try:
        num = int(os.environ["SEQ2SEQ_NUM_PROCESSES"])
        pid = int(os.environ["SEQ2SEQ_PROCESS_ID"])
    except KeyError as e:
        raise RuntimeError(
            "SEQ2SEQ_COORDINATOR_ADDRESS is set but %s is not" % e)
    return addr, num, pid


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from the env; False if not configured.

    Must be called before the first jax.devices()/jit (backends bind the
    collective client at initialization).
    """
    env = multihost_env()
    if env is None:
        return False
    addr, num, pid = env
    import jax

    if num > 1:
        try:
            # CPU backend needs an explicit collectives impl (virtual
            # multi-host tests; harmless for TPU, which uses ICI/DCN)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=num, process_id=pid)
    if num > 1:
        # Build the all-device collective clique NOW, while the processes
        # are still in lockstep from initialize()'s coordinator barrier.
        # Clique setup has a fixed ~30 s key-exchange deadline inside the
        # runtime (gloo: "GetKeyValue() timed out"); without this warm-up
        # the first collective runs only after each process's independent
        # jit compile of the train step, and on a contended host that
        # compile skew can exceed the deadline and kill the job.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("seq2seq:init-clique")
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns filesystem side effects
    (history.log, checkpoint.pt, result CSVs)."""
    return process_index() == 0


def sync_processes(name: str = "barrier") -> None:
    """Block until every process reaches this point (e.g. before process
    0 reads a checkpoint the others just helped finish writing)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
