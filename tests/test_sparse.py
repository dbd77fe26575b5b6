"""SparseLeastSquaresELL: the rcv1-scale sparse-rows oracle
(BASELINE.json configs name a large sparse Lasso; the reference itself
is dense-only, so the format is ours — ELL padded fixed-nnz).

The contract: a sparse oracle built from a dense matrix must drive
every solver family down the SAME trajectory as the dense
LeastSquaresRows oracle (the math is identical; only the data layout
differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu.oracles import LeastSquaresRows, SparseLeastSquaresELL
from ciao_tpu.prox import NormL1
from ciao_tpu.utils.problems import make_lasso

N, n, K = 128, 32, 8


@pytest.fixture(scope="module")
def pair():
    """(dense oracle, sparse oracle, problem) on a K-sparse row matrix."""
    rng = np.random.default_rng(0)
    prob = make_lasso(N=N, n=n, p=4, seed=1, dtype=np.float64,
                      well_conditioned=True)
    A = np.array(prob.A)
    # sparsify each row to K entries (keep the largest) and rebuild b
    # so the planted optimum is NOT preserved — these tests compare
    # trajectories, not optima
    keep = np.argsort(-np.abs(A), axis=1)[:, :K]
    As = np.zeros_like(A)
    rows = np.arange(N)[:, None]
    As[rows, keep] = A[rows, keep]
    b = As @ prob.x_star + rng.standard_normal(N) * 0.1
    Fd = LeastSquaresRows(A=jnp.asarray(As), b=jnp.asarray(b),
                          scale=jnp.asarray(float(N), jnp.float64))
    Fs = SparseLeastSquaresELL.from_dense(As, b, float(N), K=K)
    assert Fs.idx.shape == (N, K) and Fs.dim == n
    return Fd, Fs, prob


def _close(a, b, tol=1e-9):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=tol, atol=tol)


def test_oracle_protocol_matches_dense(pair):
    Fd, Fs, _ = pair
    x = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    idx = jnp.asarray([3, 17, 99, 64], jnp.int32)
    _close(Fs.coeff_all(x), Fd.coeff_all(x))
    _close(Fs.coeff_batch(x, idx), Fd.coeff_batch(x, idx))
    _close(Fs.coeff_block(x, 16, 32), Fd.coeff_block(x, 16, 32))
    w = jnp.asarray(np.random.default_rng(3).standard_normal(4))
    _close(Fs.apply_rows(w, idx), Fd.apply_rows(w, idx))
    wN = jnp.asarray(np.random.default_rng(4).standard_normal(N))
    _close(Fs.apply_all(wN), Fd.apply_all(wN))
    _close(Fs.grad_sum_all(x), Fd.grad_sum_all(x))
    x2 = x + 0.3
    _close(Fs.grad_sum_diff_block(x, x2, 32, 32),
           Fd.grad_sum_diff_block(x, x2, 32, 32))
    _close(Fs.grad_block(x, 0, 16), Fd.grad_block(x, 0, 16))
    v1, g1 = Fs.value_and_grad_i(x, 7)
    v2, g2 = Fd.value_and_grad_i(x, 7)
    _close(v1, v2)
    _close(g1, g2)


@pytest.mark.parametrize("family", ["saga", "finito", "lfinito", "svrg"])
def test_sparse_trajectory_equals_dense(pair, family):
    Fd, Fs, prob = pair
    g = NormL1(lam=jnp.asarray(prob.lam))
    L = jnp.asarray([float(N) * float(jnp.sum(Fs.val[i] ** 2))
                     for i in range(N)])
    x0 = jnp.zeros(n)
    outs = []
    for F in (Fd, Fs):
        if family == "saga":
            from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

            cfg = SAGACfg(N=N, sag=False, batch=16, block=True, coeff=True)
            gam = jnp.asarray(1.0 / (3.0 * float(jnp.max(L))))
            st = saga_run(F, g, saga_init(F, g, x0, gam,
                                          jax.random.PRNGKey(0), cfg), cfg, 40)
            outs.append(st.z)
        elif family in ("finito", "lfinito"):
            from ciao_tpu.solvers.finito import (
                FinitoCfg, finito_coeff_init, finito_run, lfinito_init,
            )

            cfg = FinitoCfg(N=N, batch=16, sweeping=3, alpha=0.999)
            gamma = 0.999 * N / L
            if family == "finito":
                st = finito_run(F, g, finito_coeff_init(
                    F, g, x0, gamma, jax.random.PRNGKey(1), cfg),
                    cfg, "basic_coeff", 40)
            else:
                st = finito_run(F, g, lfinito_init(
                    F, g, x0, gamma, jax.random.PRNGKey(1), cfg),
                    cfg, "lfinito", 4)
            outs.append(st.z)
        else:
            from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

            cfg = SVRGCfg(N=N, plus=False, batch=16, block=True)
            gam = jnp.asarray(1.0 / (10.0 * float(jnp.max(L))))
            st = svrg_run(F, g, svrg_init(F, g, x0, gam, 8,
                                          jax.random.PRNGKey(2), cfg), cfg, 3)
            outs.append(st.z_full)
    _close(outs[0], outs[1], tol=1e-8)


def test_sparse_facade_converges():
    """End-to-end: a genuinely sparse planted Lasso through the SAGA
    facade (coeff table, gather/scatter paths) reaches the reference
    tolerance."""
    import ciao_tpu

    rng = np.random.default_rng(5)
    Np, npx, Kp = 256, 64, 8
    prob = make_lasso(N=Np, n=npx, p=4, seed=2, dtype=np.float64,
                      well_conditioned=True)
    A = np.array(prob.A)
    keep = np.argsort(-np.abs(A), axis=1)[:, :Kp]
    As = np.zeros_like(A)
    As[np.arange(Np)[:, None], keep] = A[np.arange(Np)[:, None], keep]
    b = np.asarray(As @ prob.x_star)
    Fs = SparseLeastSquaresELL.from_dense(As, b, float(Np), K=Kp)
    g = NormL1(lam=jnp.asarray(0.01))
    L = (As ** 2).sum(axis=1) * Np
    x, it = ciao_tpu.SAGA(maxit=20000, batch=16, block_sampling=True)(
        jnp.zeros(npx), F=Fs, g=g, L=L, N=Np)
    cost = lambda x: 0.5 * float(np.sum((As @ np.asarray(x) - b) ** 2)) + \
        0.01 * float(np.sum(np.abs(np.asarray(x))))
    # planted point is feasible: cost(x)≈cost near the sparse optimum
    assert cost(x) < cost(np.zeros(npx)) * 1e-3
    assert bool(jnp.all(jnp.isfinite(x)))
