"""Data pipeline: annotation parsing, cached wav segment extraction,
bucketed padded batching, on-device STFT frontend."""
