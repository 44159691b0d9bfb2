"""Batch inference: encode datasets to class probs / logits / features."""
