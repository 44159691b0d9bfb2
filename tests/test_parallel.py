"""Data-parallel training on the virtual 8-device CPU mesh: sharded step
equals single-device step; graft entry points work."""

import numpy as np
import pytest

import jax

from seq2seq_abcd_vae_tpu.parallel import (make_mesh, replicate,
                                           shard_batch_arrays)


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(4)
    assert mesh.size == 4
    a = np.zeros((8, 3), np.float32)
    (sa,) = shard_batch_arrays(mesh, a)
    assert len(sa.sharding.device_set) == 4
    with pytest.raises(ValueError):
        shard_batch_arrays(mesh, np.zeros((7, 3), np.float32))


def test_dp_step_matches_single_device():
    """One data-parallel train step over 8 CPU devices must produce the
    same params as the unsharded step (same keys, same batch)."""
    import __graft_entry__ as ge
    from seq2seq_abcd_vae_tpu.models import vae
    from seq2seq_abcd_vae_tpu.train import optim
    from seq2seq_abcd_vae_tpu.train.learner import StepStatics, _train_step

    cfg = ge._flagship_config(input_size=65, k=8, f=16, hidden=16)
    params = vae.model_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(0.1, 0.0, 1.0)
    opt_state = tx.init(params)
    statics = StepStatics(model=cfg, frame_length=128, step_size=64,
                          window="hann_window", epsilon=2.0 ** -15,
                          normalizer=11.0)
    b, bucket = 8, 32
    buf = (bucket - 1) * 64 + 128
    rng = np.random.default_rng(3)
    audio = rng.normal(size=(b, buf)).astype(np.float32)
    num_frames = np.full((b,), bucket, np.int32)
    num_frames[-2:] = bucket // 2
    speakers = (np.arange(b) % 2).astype(np.int32)
    key = jax.random.PRNGKey(7)

    # copy before the single-device step: _train_step donates params
    params_copy = jax.tree_util.tree_map(np.asarray, params)
    opt_copy = jax.tree_util.tree_map(np.asarray, opt_state)
    p1, _, m1 = _train_step(params, opt_state, audio, num_frames, speakers,
                            key, float(b), 1.0, statics=statics,
                            no_sample=True, bucket_frames=bucket, tx=tx)

    mesh = make_mesh(8)
    pr = jax.device_put(params_copy, replicate(mesh))
    osr = jax.device_put(opt_copy, replicate(mesh))
    sa, sn, ss = shard_batch_arrays(mesh, audio, num_frames, speakers)
    kr = jax.device_put(key, replicate(mesh))
    p2, _, m2 = _train_step(pr, osr, sa, sn, ss, kr, float(b), 1.0,
                            statics=statics, no_sample=True,
                            bucket_frames=bucket, tx=tx)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5,
                                   atol=1e-6)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    loss, logits = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert logits.shape == (8, 128)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
