"""Tests for synthetic instance generation (reference utils.jl semantics)."""

import numpy as np
import pytest

from omc.data import (
    generate_masked_bitmatrix,
    generate_matrix_completion_data,
    generate_sparse_masked_bitmatrix,
)


def test_masked_bitmatrix_coverage_and_count():
    idx = generate_masked_bitmatrix(10, 12, 40, seed=3)
    assert idx.shape == (10, 12)
    assert idx.sum() == 40
    assert idx.any(axis=0).all() and idx.any(axis=1).all()


def test_sparse_masked_bitmatrix_coverage_and_count():
    for n, m in [(8, 8), (6, 10), (10, 6)]:
        idx = generate_sparse_masked_bitmatrix(n, m, max(n, m) + 5, seed=7)
        assert idx.shape == (n, m)
        assert idx.sum() == max(n, m) + 5
        assert idx.any(axis=0).all() and idx.any(axis=1).all()


def test_generate_data_shapes_and_nesting():
    A1, idx1 = generate_matrix_completion_data(1, 10, 10, 50, seed=0)
    assert A1.shape == (10, 10) and idx1.shape == (10, 10)
    # nested-consistency: the (k, seed) instance at a smaller size is a
    # sub-block of the larger one (the n_max/m_max slicing trick)
    A2, _ = generate_matrix_completion_data(1, 8, 8, 35, seed=0)
    np.testing.assert_allclose(A2, A1[:8, :8], rtol=1e-12)


def test_generate_data_validation():
    with pytest.raises(ValueError):
        generate_matrix_completion_data(1, 10, 5, 30, seed=0)  # n > m
    with pytest.raises(ValueError):
        generate_matrix_completion_data(2, 10, 10, 10, seed=0)  # underdetermined
    with pytest.raises(ValueError):
        generate_matrix_completion_data(1, 10, 10, 101, seed=0)  # too many
