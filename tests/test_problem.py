"""Golden tests for the exact metric oracles (reference semantics
C16/C19/C20, see SURVEY.md section 4)."""

import numpy as np
import pytest

from omc.problem import compute_MSE, compute_SDP_relaxation_objective, evaluate_objective


def test_evaluate_objective_hand_computed():
    X = np.array([[1.0, 2.0], [3.0, 4.0]])
    A = np.array([[1.5, 2.0], [0.0, 1.0]])
    mask = np.array([[True, False], [False, True]])
    U = np.ones((2, 1))
    gamma = 2.0
    # fit: 1/2 * ((1-1.5)^2 + (4-1)^2) = 1/2 * (0.25 + 9) = 4.625
    # reg: 1/4 * (1+4+9+16) = 7.5
    assert float(evaluate_objective(X, A, mask, U, gamma)) == pytest.approx(12.125)


def test_relaxation_objective_forms_agree_when_W_equals_Xsq():
    rng = np.random.default_rng(0)
    n, m = 4, 5
    X = rng.standard_normal((n, m))
    A = rng.standard_normal((n, m))
    mask = rng.random((n, m)) < 0.5
    Theta = np.diag(rng.random(m))
    gamma = 3.0
    a = compute_SDP_relaxation_objective(X, None, Theta, None, A, mask, gamma)
    b = compute_SDP_relaxation_objective(
        X, None, Theta, None, A, mask, gamma,
        add_Shor_valid_inequalities=True, W=X**2,
    )
    assert float(a) == pytest.approx(float(b), rel=1e-12)


def test_mse_kinds():
    X = np.array([[1.0, 0.0], [0.0, 1.0]])
    A = np.array([[0.0, 0.0], [0.0, 0.0]])
    mask = np.array([[True, False], [False, False]])
    assert float(compute_MSE(X, A, mask, kind="in")) == pytest.approx(1.0)
    assert float(compute_MSE(X, A, mask, kind="out")) == pytest.approx(1.0 / 3.0)
    assert float(compute_MSE(X, A, mask, kind="all")) == pytest.approx(0.5)
    # empty conventions
    full = np.ones((2, 2), dtype=bool)
    assert float(compute_MSE(X, A, full, kind="out")) == 0.0
    empty = np.zeros((2, 2), dtype=bool)
    assert float(compute_MSE(X, A, empty, kind="in")) == 0.0


def test_mse_invalid_kind():
    with pytest.raises(ValueError):
        compute_MSE(np.eye(2), np.eye(2), np.eye(2) > 0, kind="bogus")
