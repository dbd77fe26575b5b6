"""L1-regularized logistic regression acceptance suite — parity with
reference ``test/test_logistic_l1.jl``: 8 hardcoded samples, 5 features,
λ = 1/N, hardcoded x_star, maxit = 9000, ∞-norm tolerance 1e-4; plus the
10-step cyclic determinism test (iterator trajectory == solve trajectory).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ciao_tpu
from ciao_tpu import Finito, SAG, SAGA, SVRG, iterator, solution
from ciao_tpu.oracles import LogisticRows
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers import loop, take
from ciao_tpu.utils import make_logistic_l1

MAXIT = 9000
TOL = 1e-4


@pytest.fixture(scope="module")
def logistic():
    prob = make_logistic_l1()
    F = LogisticRows(X=jnp.asarray(prob.X), y=jnp.asarray(prob.y))
    g = NormL1(lam=jnp.asarray(prob.lam))
    x0 = jnp.ones(5)
    return prob, F, g, x0


def check(prob, x):
    assert np.max(np.abs(np.asarray(x) - prob.x_star)) < TOL


@pytest.mark.parametrize("sweeping", [1, 2, 3])
def test_finito_basic(logistic, sweeping):
    prob, F, g, x0 = logistic
    x, _ = Finito(maxit=MAXIT, sweeping=sweeping)(x0, F=F, g=g, L=prob.L, N=8)
    check(prob, x)


@pytest.mark.parametrize("sweeping", [2, 3])
def test_lfinito(logistic, sweeping):
    prob, F, g, x0 = logistic
    x, _ = Finito(maxit=MAXIT, sweeping=sweeping, LFinito=True)(
        x0, F=F, g=g, L=prob.L, N=8
    )
    check(prob, x)


@pytest.mark.parametrize("sweeping,batch", [(1, 2), (2, 2), (3, 3)])
def test_finito_minibatch(logistic, sweeping, batch):
    prob, F, g, x0 = logistic
    x, _ = Finito(maxit=MAXIT, sweeping=sweeping, minibatch=(True, batch))(
        x0, F=F, g=g, L=prob.L, N=8
    )
    check(prob, x)


@pytest.mark.parametrize("sweeping,batch", [(2, 1), (2, 2), (3, 3)])
def test_lfinito_minibatch(logistic, sweeping, batch):
    prob, F, g, x0 = logistic
    x, _ = Finito(
        maxit=MAXIT, sweeping=sweeping, LFinito=True, minibatch=(True, batch)
    )(x0, F=F, g=g, L=prob.L, N=8)
    check(prob, x)


def test_scalar_gamma_and_L(logistic):
    prob, F, g, x0 = logistic
    gamma = 8.0 / float(np.max(prob.L))
    x, _ = Finito(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, L=prob.L, N=8)
    check(prob, x)
    x2, _ = Finito(maxit=MAXIT)(x0, F=F, g=g, L=float(np.max(prob.L)), N=8)
    check(prob, x2)


@pytest.mark.parametrize("LFinito", [True, False])
def test_iterator_10step_determinism(logistic, LFinito):
    """reference test_logistic_l1.jl:111-122: under cyclic sweeping, 10
    iterator states == a maxit=10 solve, exactly."""
    prob, F, g, x0 = logistic
    solver = Finito(sweeping=2, LFinito=LFinito, maxit=10)
    it = iterator(solver, x0, F=F, g=g, L=prob.L, N=8)
    assert it.x0 is x0
    for state in take(iter(it), 2):
        assert solution(state) is state.z
        assert np.asarray(solution(state)).dtype == np.float64
    x_solve, _ = solver(x0, F=F, g=g, L=prob.L, N=8)
    x_iter = solution(loop(take(iter(it), 10)))
    np.testing.assert_array_equal(np.asarray(x_iter), np.asarray(x_solve))


def test_svrg(logistic):
    prob, F, g, x0 = logistic
    gamma = 1.0 / (10 * float(np.max(prob.L)))
    x, _ = SVRG(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, N=8)
    assert np.linalg.norm(np.asarray(x) - prob.x_star) < TOL


def test_svrg_plus(logistic):
    prob, F, g, x0 = logistic
    gamma = 1.0 / (10 * float(np.max(prob.L)))
    x, _ = SVRG(maxit=16, gamma=gamma, m=8, plus=True)(x0, F=F, g=g, N=8)
    assert np.linalg.norm(np.asarray(x) - prob.x_star) < TOL


def test_svrg_iterator(logistic):
    prob, F, g, x0 = logistic
    gamma = 1.0 / (10 * float(np.max(prob.L)))
    solver = SVRG(gamma=gamma)
    it = iterator(solver, x0, F=F, g=g, N=8)
    assert it.x0 is x0
    states = list(take(iter(it), 2))
    for state in states:
        assert solution(state) is state.z_full
    x1, _ = SVRG(gamma=gamma, maxit=1)(x0, F=F, g=g, L=prob.L, N=8)
    np.testing.assert_array_equal(np.asarray(solution(states[0])), np.asarray(x1))


def test_saga_sag(logistic):
    prob, F, g, x0 = logistic
    x, _ = SAGA(maxit=MAXIT)(x0, F=F, g=g, N=8, L=prob.L)
    assert np.linalg.norm(np.asarray(x) - prob.x_star) < TOL
    gamma = 1.0 / (3 * float(np.max(prob.L)))
    x2, _ = SAGA(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, N=8)
    assert np.linalg.norm(np.asarray(x2) - prob.x_star) < TOL
    # SAG (biased) — reference only smoke-runs these (missing @test);
    # we assert convergence properly.
    x3, _ = SAG(maxit=MAXIT)(x0, F=F, g=g, N=8, L=prob.L)
    assert np.linalg.norm(np.asarray(x3) - prob.x_star) < 1e-2
    # iterator init equivalence
    solver = SAGA(gamma=gamma)
    it = iterator(solver, x0, F=F, g=g, N=8)
    states = list(take(iter(it), 2))
    x1, _ = SAGA(gamma=gamma, maxit=1)(x0, F=F, g=g, L=prob.L, N=8)
    np.testing.assert_array_equal(np.asarray(solution(states[0])), np.asarray(x1))


def test_katyusha_logistic(logistic):
    """Katyusha (beyond the reference) on the reference's hardcoded
    L1-logistic problem: the accelerated method reaches the same
    hardcoded x_star at the reference's ∞-norm tolerance in a fraction
    of the budget (the logistic oracle exercises the non-lsq
    coefficient formula through grad_sum_diff)."""
    prob, F, g, x0 = logistic
    x, _ = ciao_tpu.Katyusha(maxit=120)(x0, F=F, g=g, L=prob.L, N=8)
    check(prob, x)
