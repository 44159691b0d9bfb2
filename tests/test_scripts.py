"""Unit tests for the benchmark/parity harness helpers."""

import sys

import numpy as np

sys.path.insert(0, "scripts")

from parity_run import adjusted_rand_index  # noqa: E402


def test_ari_identical_partitions():
    a = [0, 0, 1, 1, 2, 2]
    assert adjusted_rand_index(a, a) == 1.0
    # label permutation invariant
    b = [5, 5, 9, 9, 1, 1]
    assert adjusted_rand_index(a, b) == 1.0


def test_ari_random_partitions_near_zero(rng):
    a = rng.integers(0, 4, size=2000)
    b = rng.integers(0, 4, size=2000)
    assert abs(adjusted_rand_index(a, b)) < 0.05


def test_ari_constant_vs_split():
    a = [0] * 10
    b = [0] * 5 + [1] * 5
    assert adjusted_rand_index(a, b) == 0.0


def test_ari_matches_sklearn_formula():
    # hand-checked example
    a = [0, 0, 0, 1, 1, 1]
    b = [0, 0, 1, 1, 2, 2]
    got = adjusted_rand_index(a, b)
    np.testing.assert_allclose(got, 0.24242424, rtol=1e-6)
