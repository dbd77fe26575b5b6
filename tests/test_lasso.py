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


# ---------------------------------------------------------------------------
# non-dividing minibatch (N % batch != 0) — reference parity
# ---------------------------------------------------------------------------
#
# The reference's static contiguous blocks end with a SMALLER final
# batch when batch does not divide N (Finito_basic.jl:53-58); here that
# is the masked-gather path (finito.py masked branch, proshi.py masked
# branch). These tests pin (a) exact trajectory parity of the masked
# path with a numpy simulation of the reference's ragged-batch
# semantics, and (b) convergence at the reference tolerance for every
# family under both block schedules.

def _ragged_lasso(N=10, n=3):
    prob = make_lasso(N=N, n=n, p=2, seed=7)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
        scale=jnp.asarray(float(N)),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    return prob, F, g


def test_finito_ragged_final_batch_matches_reference_semantics():
    """Finito basic, cyclic sweeping, N=10 B=4 → blocks {0-3},{4-7},
    {8,9}: the masked path's trajectory must equal a numpy simulation
    of the reference's smaller-final-batch iterate (same visit order —
    cyclic starts at block 2, i.e. 0-based block 1 — same batched
    z-read, prox after the batch)."""
    N_, B = 10, 4
    prob, F, g = _ragged_lasso(N=N_)
    A = np.asarray(prob.A, np.float64)
    b = np.asarray(prob.b, np.float64)
    lam = float(prob.lam)
    gam = 0.999 * N_ / np.asarray(prob.L, np.float64)

    # numpy reference: ragged static blocks, reference init + step
    def grad(i, z):
        return N_ * (A[i] @ z - b[i]) * A[i]

    nvar = A.shape[1]
    x0v = np.zeros(nvar)
    s = np.stack([x0v - gam[i] / N_ * grad(i, x0v) for i in range(N_)])
    hat = 1.0 / np.sum(1.0 / gam)
    av = hat * np.sum(s / gam[:, None], axis=0)

    def prox(v):
        return np.sign(v) * np.maximum(np.abs(v) - hat * lam, 0)

    z = prox(av)
    blocks = [list(range(0, 4)), list(range(4, 8)), [8, 9]]
    zs = []
    pos = 1  # reference cyclic idxr init: first visited block is #2
    for _ in range(7):
        blk = blocks[pos % 3]
        pos += 1
        for i in blk:  # all read the SAME z; prox after the batch
            s_new = z - gam[i] / N_ * grad(i, z)
            av = av + (s_new - s[i]) * hat / gam[i]
            s[i] = s_new
        z = prox(av)
        zs.append(z.copy())

    # framework run, step by step through the iterator
    it = ciao_tpu.Finito(sweeping=2, minibatch=(True, B)).iterator(
        jnp.zeros(nvar), F=F, g=g, L=prob.L, N=N_
    )
    stream = iter(it)
    next(stream)  # init state
    for k in range(7):
        st = next(stream)
        np.testing.assert_allclose(np.asarray(st.z), zs[k],
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=f"step {k}")


@pytest.mark.parametrize("sweeping", [2, 3])
def test_finito_ragged_converges(sweeping):
    prob, F, g = _ragged_lasso()
    x, _ = ciao_tpu.Finito(maxit=1500, sweeping=sweeping,
                           minibatch=(True, 4))(
        jnp.zeros(3), F=F, g=g, L=prob.L, N=10
    )
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4


@pytest.mark.parametrize("sweeping", [2, 3])
def test_lfinito_ragged_converges(sweeping):
    prob, F, g = _ragged_lasso()
    x, _ = ciao_tpu.Finito(maxit=400, sweeping=sweeping, LFinito=True,
                           minibatch=(True, 4))(
        jnp.zeros(3), F=F, g=g, L=prob.L, N=10
    )
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4


@pytest.mark.parametrize("sweeping", [2, 3])
def test_proshi_ragged_converges(sweeping):
    from ciao_tpu import Proshi
    from ciao_tpu.oracles import DiagQuadratic
    from ciao_tpu.utils import make_sharing

    sp = make_sharing()
    # 3 blocks with batch 2 → ragged final block {2}
    from ciao_tpu.oracles import SqrDistBox, SumOracle
    from ciao_tpu.prox import IndBox

    quad = DiagQuadratic(d=jnp.asarray(sp.d), q=jnp.asarray(sp.q))
    soft = SqrDistBox(lo=jnp.asarray(sp.box_lo), hi=jnp.asarray(sp.box_hi),
                      eta=jnp.asarray(sp.eta), n_terms=3)
    Fs = SumOracle(terms=(quad, soft))
    gs = IndBox(lo=-jnp.inf, hi=jnp.asarray(sp.g_hi))
    x, _ = Proshi(maxit=1000, sweeping=sweeping, minibatch=(True, 2))(
        jnp.zeros(2), F=Fs, g=gs, L=sp.L, N=3
    )
    assert np.max(np.abs(np.asarray(x).sum(0) - sp.sum_star)) < 1e-4
