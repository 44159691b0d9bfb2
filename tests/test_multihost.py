"""Multi-host (multi-process) data-parallel training.

SURVEY.md §2.4: the TPU-native capability superset is gradient all-reduce
over ICI within a slice AND across processes (DCN).  Here: two CPU
processes x 4 virtual devices each form one global 8-device ('data',)
mesh (jax.distributed + gloo collectives); each process materializes only
its own batch-row block (DataLoader process_shard) and the global arrays
are stitched with jax.make_array_from_process_local_data.

The 2-process run must produce the same trained parameters as a
single-process 8-device run of the identical configuration.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
TOY = os.path.join(REPO, "fixtures", "toy_data")
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _toy_annotation():
    return [os.path.join(TOY, f) for f in os.listdir(TOY)
            if f.endswith(".csv")][0]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_single(tmp_path):
    """Single-process 8-device ground truth, in a subprocess for a clean
    jax runtime (the parent pytest process already holds devices)."""
    save_root = str(tmp_path / "single")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("SEQ2SEQ_COORDINATOR_ADDRESS", None)
    subprocess.run(
        [sys.executable, WORKER, save_root, TOY, _toy_annotation()],
        env=env, check=True, timeout=1200, capture_output=True)
    return os.path.join(save_root, "mh", "checkpoint.pt")


def _run_multi(tmp_path, num_procs=2, epochs="2", devices_per_proc=4):
    save_root = str(tmp_path / "multi")
    port = _free_port()
    procs = []
    for pid in range(num_procs):
        env = dict(
            os.environ,
            XLA_FLAGS=("--xla_force_host_platform_device_count="
                       f"{devices_per_proc}"),
            SEQ2SEQ_COORDINATOR_ADDRESS=f"localhost:{port}",
            SEQ2SEQ_NUM_PROCESSES=str(num_procs),
            SEQ2SEQ_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, save_root, TOY, _toy_annotation(),
             epochs],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=1200) for p in procs]
    # report EVERY failed rank: the root-cause rank's traceback is often
    # not the first one asserted (a crashed peer leaves the others stuck
    # in collectives until the shutdown barrier kills them)
    failed = [(i, err.decode()[-2500:]) for i, (p, (_, err))
              in enumerate(zip(procs, outs)) if p.returncode != 0]
    assert not failed, "\n".join(f"--- rank {i} ---\n{e}"
                                 for i, e in failed)
    return os.path.join(save_root, "mh", "checkpoint.pt")


def _params_arrays(ckpt_path):
    from seq2seq_abcd_vae_tpu.train.checkpoint import load_checkpoint
    payload = load_checkpoint(ckpt_path)
    out = {}
    for module in ("encoder", "feature_sampler", "decoder"):
        for path, leaf in _flatten(payload[module]):
            out[f"{module}/{path}"] = np.asarray(leaf)
    return out


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix, tree


def _assert_params_close(single, multi):
    ps, pm = _params_arrays(single), _params_arrays(multi)
    assert set(ps) == set(pm)
    worst = 0.0
    for k in ps:
        assert ps[k].shape == pm[k].shape, k
        if ps[k].dtype == object:
            continue
        diff = float(np.max(np.abs(ps[k].astype(np.float64)
                                   - pm[k].astype(np.float64))))
        worst = max(worst, diff)
    # XLA's intra-process all-reduce and gloo's cross-process all-reduce
    # may associate the 8 partial gradient sums differently, so exact
    # bitwise equality is not guaranteed by IEEE float addition; measured
    # agreement is far tighter than any training-relevant scale.
    assert worst <= 1e-5, worst


def test_two_process_training_matches_single_process(tmp_path):
    single = _run_single(tmp_path)
    multi = _run_multi(tmp_path)
    _assert_params_close(single, multi)


def test_four_process_training_matches_single_process(tmp_path):
    """Same global 8-device mesh split 4 ways (2 virtual devices per
    process): more ranks exercises the per-process row sharding and the
    cross-process all-reduce at a different process/device factoring."""
    single = _run_single(tmp_path)
    multi = _run_multi(tmp_path, num_procs=4, devices_per_proc=2)
    _assert_params_close(single, multi)


def test_multihost_writes_single_history_and_checkpoint(tmp_path):
    multi = _run_multi(tmp_path, epochs="1")
    run_dir = os.path.dirname(multi)
    assert os.path.isfile(os.path.join(run_dir, "history.log"))
    assert os.path.isfile(multi)
    txt = open(os.path.join(run_dir, "history.log")).read()
    assert txt.count("END OF TRAINING") == 1
    assert "across 2 processes" in txt
