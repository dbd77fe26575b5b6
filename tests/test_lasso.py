"""Lasso acceptance suite — parity with reference ``test/test_lasso.jl``:
1/2 ||Ax-b||^2 + λ||x||_1 with a planted optimum, swept over
{f32, f64, c64, c128}, all solver families and variants, with the same
iteration budgets and the 1e-4 suboptimality tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ciao_tpu
from ciao_tpu import Finito, SAG, SAGA, SVRG, iterator, solution
from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.prox import NormL1
from ciao_tpu.utils import make_lasso

MAXIT = 1000
TOL = 1e-4

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


@pytest.fixture(params=DTYPES, ids=["f32", "f64", "c64", "c128"])
def lasso(request):
    dtype = request.param
    prob = make_lasso(N=6, n=3, p=2, seed=0, dtype=dtype)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b), scale=jnp.asarray(6.0)
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    x0 = jnp.zeros(3, dtype)
    return prob, F, g, x0, dtype


def check(prob, x, dtype):
    assert np.asarray(x).dtype == np.dtype(dtype)
    assert prob.cost(np.asarray(x)) - prob.f_star < TOL


@pytest.mark.parametrize("sweeping", [1, 2, 3])
def test_finito_basic(lasso, sweeping):
    prob, F, g, x0, dtype = lasso
    solver = Finito(maxit=MAXIT, sweeping=sweeping)
    x, it = solver(x0, F=F, g=g, L=prob.L, N=6)
    assert it == MAXIT
    check(prob, x, dtype)


@pytest.mark.parametrize("sweeping", [2, 3])
def test_lfinito(lasso, sweeping):
    prob, F, g, x0, dtype = lasso
    solver = Finito(maxit=MAXIT, sweeping=sweeping, LFinito=True)
    x, _ = solver(x0, F=F, g=g, L=prob.L, N=6)
    check(prob, x, dtype)


@pytest.mark.parametrize("sweeping", [1, 2, 3])
def test_finito_adaptive(lasso, sweeping):
    prob, F, g, x0, dtype = lasso
    solver = Finito(maxit=MAXIT, tol=1e-5, sweeping=sweeping, adaptive=True)
    x, _ = solver(x0, F=F, g=g, L=prob.L, N=6)
    check(prob, x, dtype)


@pytest.mark.parametrize("sweeping,batch", [(1, 2), (2, 2), (3, 3)])
def test_finito_minibatch(lasso, sweeping, batch):
    prob, F, g, x0, dtype = lasso
    solver = Finito(maxit=MAXIT, sweeping=sweeping, minibatch=(True, batch))
    x, _ = solver(x0, F=F, g=g, L=prob.L, N=6)
    check(prob, x, dtype)


@pytest.mark.parametrize("sweeping,batch", [(2, 1), (2, 2), (3, 3)])
def test_lfinito_minibatch(lasso, sweeping, batch):
    prob, F, g, x0, dtype = lasso
    solver = Finito(
        maxit=MAXIT, sweeping=sweeping, LFinito=True, minibatch=(True, batch)
    )
    x, _ = solver(x0, F=F, g=g, L=prob.L, N=6)
    check(prob, x, dtype)


def test_finito_scalar_gamma_and_L(lasso):
    prob, F, g, x0, dtype = lasso
    gamma = 6.0 / float(np.max(prob.L))
    x, _ = Finito(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, L=prob.L, N=6)
    check(prob, x, dtype)
    # scalar L broadcast
    x2, _ = Finito(maxit=MAXIT)(x0, F=F, g=g, L=float(np.max(prob.L)), N=6)
    check(prob, x2, dtype)


@pytest.mark.parametrize(
    "sweeping,LFinito,adaptive",
    [(1, False, False), (2, False, False), (3, False, True), (3, True, False)],
)
def test_finito_iterator_contract(lasso, sweeping, LFinito, adaptive):
    prob, F, g, x0, dtype = lasso
    solver = Finito(sweeping=sweeping, LFinito=LFinito, adaptive=adaptive)
    it = iterator(solver, x0, F=F, g=g, L=prob.L, N=6)
    assert it.x0 is x0  # no copy on construction (test_lasso.jl:151)
    for state in ciao_tpu.solvers.take(iter(it), 2):
        assert solution(state) is state.z  # zero-copy view
        assert np.asarray(solution(state)).dtype == np.dtype(dtype)


def test_svrg(lasso):
    prob, F, g, x0, dtype = lasso
    gamma = 1.0 / (7 * float(np.max(prob.L)))
    x, _ = SVRG(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, N=6)
    check(prob, x, dtype)


def test_svrg_plus(lasso):
    prob, F, g, x0, dtype = lasso
    gamma = 1.0 / (7 * float(np.max(prob.L)))
    x, _ = SVRG(maxit=16, gamma=gamma, m=1, plus=True)(x0, F=F, g=g, N=6)
    check(prob, x, dtype)


def test_svrg_iterator_and_init_equivalence(lasso):
    prob, F, g, x0, dtype = lasso
    gamma = 1.0 / (7 * float(np.max(prob.L)))
    solver = SVRG(gamma=gamma)
    it = iterator(solver, x0, F=F, g=g, N=6)
    assert it.x0 is x0
    states = list(ciao_tpu.solvers.take(iter(it), 2))
    for state in states:
        assert solution(state) is state.z_full
        assert np.asarray(solution(state)).dtype == np.dtype(dtype)
    # the init state IS iteration #1: maxit=1 solve == first yielded state
    x1, it1 = SVRG(gamma=gamma, maxit=1)(x0, F=F, g=g, L=prob.L, N=6)
    assert it1 == 1
    np.testing.assert_array_equal(np.asarray(solution(states[0])), np.asarray(x1))


def test_saga(lasso):
    prob, F, g, x0, dtype = lasso
    x, _ = SAGA(maxit=MAXIT)(x0, F=F, g=g, N=6, L=prob.L)
    check(prob, x, dtype)
    gamma = 1.0 / (3 * float(np.max(prob.L)))
    x2, _ = SAGA(maxit=MAXIT, gamma=gamma)(x0, F=F, g=g, N=6)
    check(prob, x2, dtype)


def test_saga_iterator_and_init_equivalence(lasso):
    prob, F, g, x0, dtype = lasso
    gamma = 1.0 / (3 * float(np.max(prob.L)))
    solver = SAGA(gamma=gamma)
    it = iterator(solver, x0, F=F, g=g, N=6)
    assert it.x0 is x0
    states = list(ciao_tpu.solvers.take(iter(it), 2))
    for state in states:
        assert solution(state) is state.z
    x1, _ = SAGA(gamma=gamma, maxit=1)(x0, F=F, g=g, L=prob.L, N=6)
    np.testing.assert_array_equal(np.asarray(solution(states[0])), np.asarray(x1))


def test_sag(lasso):
    prob, F, g, x0, dtype = lasso
    maxit = 10000
    x, _ = SAG(maxit=maxit)(x0, F=F, g=g, N=6, L=prob.L)
    check(prob, x, dtype)
    gamma = 1.0 / (16 * float(np.max(prob.L)))
    x2, _ = SAG(maxit=maxit, gamma=gamma)(x0, F=F, g=g, N=6)
    check(prob, x2, dtype)
    # iterator + init equivalence
    solver = SAG(gamma=gamma)
    it = iterator(solver, x0, F=F, g=g, N=6)
    states = list(ciao_tpu.solvers.take(iter(it), 2))
    x1, _ = SAG(gamma=gamma, maxit=1)(x0, F=F, g=g, L=prob.L, N=6)
    np.testing.assert_array_equal(np.asarray(solution(states[0])), np.asarray(x1))


def test_missing_L_raises():
    x0 = jnp.zeros(3)
    prob = make_lasso(seed=0)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b), scale=jnp.asarray(6.0)
    )
    with pytest.raises(ValueError, match="smoothness parameter absent"):
        Finito(maxit=10)(x0, F=F, g=NormL1(lam=1.0), N=6)
    with pytest.raises(ValueError, match="smoothness parameter absent"):
        SAGA(maxit=10)(x0, F=F, g=NormL1(lam=1.0), N=6)
