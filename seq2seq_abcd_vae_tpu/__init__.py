"""seq2seq_abcd_vae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
sequence-to-sequence VAE clustering of variable-length audio segments.

Re-implements the full capability surface of the reference
``tkc-morita/seq2seq_abcd-vae`` (PyTorch) as a TPU-first design:

- fused STFT + log-rescale audio frontend (Pallas kernel with a pure-XLA
  fallback), replacing the per-segment CPU ``torch.stft``
  (reference: ABCD-VAE/modules/data_utils.py:124-139);
- ``jax.lax.scan`` recurrent encoder/decoder over bucketed, padded,
  length-masked batches, replacing PyTorch ``PackedSequence`` machinery
  (reference: ABCD-VAE/modules/model.py:40-300);
- the ABCD latent head (attention-based categorical sampler with a
  Dirichlet prior, Gumbel-Softmax over a K-way codebook) and the plain
  Gaussian latent head as two configs of one model family
  (reference: ABCD-VAE/modules/model.py:538-673, plain/modules/model.py:538-568);
- a Learner runtime with SGD + global-norm clipping + ReduceLROnPlateau,
  self-describing rolling checkpoints, history.log-based resume
  (reference: ABCD-VAE/learning.py:36-347);
- data-parallel training over a ``jax.sharding.Mesh`` via pjit/NamedSharding
  (a capability the reference lacks entirely).
"""

__version__ = "0.1.0"
