"""Golden-trajectory regression oracle (reference `my_envs/traj.npz`
+ `test_trajopt_altro.jl` counterpart): the committed cartpole2link
golden was produced by the interior-point SQP path; the AL/Newton
path must keep reproducing it."""
import numpy as np
import pytest

from deqmpc_tpu.data.golden_traj import (GOLDEN_PATH, T, X0, rollout_defect,
                                         solve_al)


@pytest.fixture(scope="module")
def golden():
    d = np.load(GOLDEN_PATH)
    return d["X"], d["U"], d["x0"]


def test_golden_matches_committed_problem(golden):
    X, U, x0 = golden
    assert X.shape == (T, 6) and U.shape == (T, 1)
    np.testing.assert_allclose(x0, X0)
    np.testing.assert_allclose(X[0], X0, atol=1e-8)


def test_golden_is_dynamically_feasible(golden):
    X, U, _ = golden
    assert rollout_defect(X, U) < 1e-3


@pytest.mark.slow
def test_al_solver_reproduces_ip_golden(golden):
    """Cross-solver agreement: the AL path re-solves the regularized
    capture problem cold and lands on the IP-produced golden."""
    X, U, _ = golden
    X_al, U_al = solve_al()
    assert rollout_defect(X_al, U_al) < 1e-4
    np.testing.assert_allclose(U_al, U, atol=2e-3)
    np.testing.assert_allclose(X_al, X, atol=2e-4)
