"""Optimizer / scheduler parity vs torch (SGD + clip_grad_norm_ +
ReduceLROnPlateau, reference: ABCD-VAE/learning.py:158-163,245-288)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from seq2seq_abcd_vae_tpu.train import optim


def test_sgd_with_clip_matches_torch(rng):
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) * s
             for s in (0.1, 5.0, 1.0)]  # middle one triggers clipping
    lr, mom, clip = 0.5, 0.9, 1.0

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=lr, momentum=mom)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], clip)
        topt.step()

    tx = optim.make_optimizer(lr, mom, clip)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_sparse_embedding_sgd_parity(rng):
    """Dense speaker-embedding updates match the reference's
    `torch.nn.Embedding(..., sparse=True)` + SGD (model.py:118) at ANY
    momentum, not just the default 0.0.

    torch's SGD densifies the momentum buffer on the first step
    (`buf = d_p.clone()` of a sparse grad, then dense `mul_/add_`), so
    sparse and dense training produce fp-identical weights — measured
    here with a torch sparse-vs-dense oracle pair, then against our
    optax path with the same gather-sum gradients.  At momentum=0 the
    match is exact and untouched rows are bit-unchanged (pinned below in
    test_untouched_embedding_rows_momentum0)."""
    lr, mom, clip = 0.3, 0.9, 1e9  # clip inert: isolate SGD semantics
    n, d = 6, 4
    w0 = rng.normal(size=(n, d)).astype(np.float32)
    steps = [(rng.integers(0, n, size=3), rng.normal(size=(3, d))
              .astype(np.float32)) for _ in range(8)]

    torch_ws = {}
    for sparse in (True, False):
        emb = torch.nn.Embedding(n, d, sparse=sparse)
        with torch.no_grad():
            emb.weight.copy_(torch.from_numpy(w0))
        topt = torch.optim.SGD(emb.parameters(), lr=lr, momentum=mom)
        for idx, coef in steps:
            (emb(torch.from_numpy(idx)) * torch.from_numpy(coef)).sum() \
                .backward()
            topt.step()
            topt.zero_grad()
        torch_ws[sparse] = emb.weight.detach().numpy()
    np.testing.assert_allclose(torch_ws[True], torch_ws[False],
                               rtol=1e-5, atol=1e-6)

    tx = optim.make_optimizer(lr, mom, clip)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for idx, coef in steps:
        g = np.zeros((n, d), np.float32)
        np.add.at(g, idx, coef)  # gather-sum = dense embedding grad
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                        updates)
    np.testing.assert_allclose(np.asarray(params["w"]), torch_ws[True],
                               rtol=1e-5, atol=1e-6)


def test_untouched_embedding_rows_momentum0(rng):
    """At the reference default momentum=0.0, embedding rows whose
    speaker does not appear in the batch receive a zero dense gradient
    and must be BIT-unchanged by the update (sparse-SGD row-skip
    equivalence)."""
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    g = np.zeros((5, 3), np.float32)
    g[1] = 1.0
    g[4] = -2.0
    tx = optim.make_optimizer(0.5, 0.0, 1e9)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    new = np.asarray(jax.tree_util.tree_map(
        lambda p, u: p + u, params, updates)["w"])
    untouched = [0, 2, 3]
    assert (new[untouched] == w0[untouched]).all()
    assert (new[[1, 4]] != w0[[1, 4]]).all()


def test_learning_rate_injection():
    tx = optim.make_optimizer(1.0, 0.0, 10.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    assert optim.get_learning_rate(state) == 1.0
    state = optim.with_learning_rate(state, 0.1)
    assert optim.get_learning_rate(state) == pytest.approx(0.1)
    updates, state = tx.update({"w": jnp.ones(3)}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)


def test_plateau_matches_torch_scheduler(rng):
    metrics = [10.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.0, 7.9999, 5.0, 5.0,
               5.0, 5.0]
    for patience in (0, 2):
        tw = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.SGD([tw], lr=1.0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, patience=patience)
        ours = optim.ReduceLROnPlateau(patience=patience)
        lr = 1.0
        for m in metrics:
            tsched.step(m)
            lr = ours.step(m, lr)
            np.testing.assert_allclose(lr, topt.param_groups[0]["lr"],
                                       rtol=1e-9, err_msg=f"p={patience}")


def test_plateau_best_reset_forces_no_immediate_reduction():
    s = optim.ReduceLROnPlateau(patience=0)
    lr = s.step(1.0, 1.0)  # best=1.0
    s.reset_best()
    lr = s.step(100.0, lr)  # would be 'bad' but best was reset -> no...
    # after reset, 100.0 is not better than inf? it IS better (100 < inf)
    assert s.best == 100.0
    assert lr == 1.0


def test_plateau_state_roundtrip():
    s = optim.ReduceLROnPlateau(patience=3)
    lr = 1.0
    for m in (5.0, 6.0, 6.0):
        lr = s.step(m, lr)
    s2 = optim.ReduceLROnPlateau()
    s2.load_state_dict(s.state_dict())
    for m in (6.0, 6.0, 6.0, 6.0):
        a = s.step(m, lr)
        b = s2.step(m, lr)
        assert a == b
        lr = a
