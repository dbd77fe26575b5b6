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

from ciao_tpu.oracles import (
    HybridSparseLeastSquares,
    LeastSquaresRows,
    SparseLeastSquaresELL,
)
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


# ---------------------------------------------------------------------------
# HybridSparseLeastSquares: dense hot columns + ELL cold tail
# ---------------------------------------------------------------------------

N_H, n_H = 160, 48


def _power_law_matrix(N, n, seed=7):
    """Power-law sparse matrix: a handful of near-dense columns plus a
    sparse tail — the rcv1-style shape the hybrid layout targets."""
    rng = np.random.default_rng(seed)
    A = np.zeros((N, n))
    # hot columns (ids NOT at the front, to exercise hot_cols routing)
    hot = [c for c in (5, 11, 30, 41) if c < n] or [n - 1]
    for c in hot:
        m = rng.random(N) < 0.9
        A[m, c] = rng.standard_normal(m.sum())
    # cold tail: <=4 nnz per row among the remaining columns
    cold_cols = np.setdiff1d(np.arange(n), hot)
    for i in range(N):
        cols = rng.choice(cold_cols, size=rng.integers(0, 5), replace=False)
        A[i, cols] = rng.standard_normal(len(cols))
    b = A @ rng.standard_normal(n) + 0.05 * rng.standard_normal(N)
    return A, b


@pytest.fixture(scope="module")
def hybrid_pair():
    A, b = _power_law_matrix(N_H, n_H)
    Fd = LeastSquaresRows(A=jnp.asarray(A), b=jnp.asarray(b),
                          scale=jnp.asarray(float(N_H), jnp.float64))
    Fh = HybridSparseLeastSquares.from_dense(A, b, float(N_H), D=4)
    assert Fh.hot_width == 128            # lane-padded
    assert Fh.nnz_per_row <= 4            # only the tail is ELL
    assert Fh.dim == n_H
    # hot/cold split is disjoint: no cold idx may hold a hot column
    hot_real = set(np.asarray(Fh.hot_cols)[np.asarray(
        (Fh.A_hot != 0).any(axis=0))].tolist())
    cold_used = np.asarray(Fh.idx)[np.asarray(Fh.val) != 0]
    assert not hot_real.intersection(cold_used.tolist())
    return Fd, Fh


def test_hybrid_protocol_matches_dense(hybrid_pair):
    Fd, Fh = hybrid_pair
    x = jnp.asarray(np.random.default_rng(2).standard_normal(n_H))
    idx = jnp.asarray([3, 17, 99, 64], jnp.int32)
    _close(Fh.coeff_all(x), Fd.coeff_all(x))
    _close(Fh.coeff_batch(x, idx), Fd.coeff_batch(x, idx))
    _close(Fh.coeff_block(x, 16, 32), Fd.coeff_block(x, 16, 32))
    w = jnp.asarray(np.random.default_rng(3).standard_normal(4))
    _close(Fh.apply_rows(w, idx), Fd.apply_rows(w, idx))
    _close(Fh.apply_rows_block(w, 8, 4), Fd.apply_rows_block(w, 8, 4))
    wN = jnp.asarray(np.random.default_rng(4).standard_normal(N_H))
    _close(Fh.apply_all(wN), Fd.apply_all(wN))
    _close(Fh.grad_sum_all(x), Fd.grad_sum_all(x))
    _close(Fh.grad_sum_batch(x, idx), Fd.grad_sum_batch(x, idx))
    mask = jnp.asarray([True, False, True, True])
    _close(Fh.grad_sum_batch(x, idx, mask), Fd.grad_sum_batch(x, idx, mask))
    x2 = x + 0.3
    _close(Fh.grad_sum_diff(x, x2, idx), Fd.grad_sum_diff(x, x2, idx))
    _close(Fh.grad_sum_diff_block(x, x2, 32, 32),
           Fd.grad_sum_diff_block(x, x2, 32, 32))
    _close(Fh.grad_block(x, 0, 16), Fd.grad_block(x, 0, 16))
    _close(Fh.grad_batch(x, idx), Fd.grad_batch(x, idx))
    xs = jnp.asarray(np.random.default_rng(6).standard_normal((4, n_H)))
    _close(Fh.grad_pointwise(xs, idx), Fd.grad_pointwise(xs, idx))
    v1, g1 = Fh.value_and_grad_i(x, 7)
    v2, g2 = Fd.value_and_grad_i(x, 7)
    _close(v1, v2)
    _close(g1, g2)


def test_hybrid_all_hot_degenerate():
    """D >= n: everything goes dense, the ELL tail is empty padding."""
    A, b = _power_law_matrix(32, 16, seed=9)
    Fd = LeastSquaresRows(A=jnp.asarray(A), b=jnp.asarray(b),
                          scale=jnp.asarray(32.0, jnp.float64))
    Fh = HybridSparseLeastSquares.from_dense(A, b, 32.0, D=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(16))
    _close(Fh.coeff_all(x), Fd.coeff_all(x))
    _close(Fh.grad_sum_all(x), Fd.grad_sum_all(x))


def test_hybrid_with_storage_bf16():
    A, b = _power_law_matrix(64, 24, seed=3)
    Fh = HybridSparseLeastSquares.from_dense(A, b, 64.0, D=4)
    Fb = Fh.with_storage()
    assert Fb.A_hot.dtype == jnp.bfloat16
    assert Fb.val.dtype == Fh.val.dtype        # cold tail stays f32/f64
    x = jnp.asarray(np.random.default_rng(0).standard_normal(24),
                    jnp.float32)
    c32 = np.asarray(Fh.coeff_all(x.astype(Fh.val.dtype)))
    cb = np.asarray(Fb.coeff_all(x.astype(Fh.val.dtype)))
    assert np.allclose(c32, cb, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("family", ["saga", "finito", "lfinito", "svrg"])
def test_hybrid_trajectory_equals_dense(hybrid_pair, family):
    Fd, Fh = hybrid_pair
    g = NormL1(lam=jnp.asarray(0.05))
    A = np.asarray(Fd.A)
    L = jnp.asarray((A ** 2).sum(axis=1) * N_H)
    x0 = jnp.zeros(n_H)
    outs = []
    for F in (Fd, Fh):
        if family == "saga":
            from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

            cfg = SAGACfg(N=N_H, sag=False, batch=16, block=True, coeff=True)
            gam = jnp.asarray(1.0 / (3.0 * float(jnp.max(L))))
            st = saga_run(F, g, saga_init(F, g, x0, gam,
                                          jax.random.PRNGKey(0), cfg), cfg, 40)
            outs.append(st.z)
        elif family in ("finito", "lfinito"):
            from ciao_tpu.solvers.finito import (
                FinitoCfg, finito_coeff_init, finito_run, lfinito_init,
            )

            cfg = FinitoCfg(N=N_H, batch=16, sweeping=3, alpha=0.999)
            gamma = 0.999 * N_H / L
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

            cfg = SVRGCfg(N=N_H, plus=False, batch=16, block=True)
            gam = jnp.asarray(1.0 / (10.0 * float(jnp.max(L))))
            st = svrg_run(F, g, svrg_init(F, g, x0, gam, 8,
                                          jax.random.PRNGKey(2), cfg), cfg, 3)
            outs.append(st.z_full)
    _close(outs[0], outs[1], tol=1e-8)


def test_katyusha_sparse_trajectory_equals_dense(pair):
    """Katyusha on the ELL oracle == Katyusha on the dense oracle
    (identical math, different layout) — the accelerated solver rides
    grad_sum_diff_block like SVRG, so sparse problems get acceleration
    for free."""
    import ciao_tpu

    Fd, Fs, prob = pair
    g = NormL1(lam=jnp.asarray(prob.lam))
    L = np.asarray([float(N) * float(jnp.sum(Fs.val[i] ** 2))
                    for i in range(N)])
    x0 = jnp.zeros(n)
    outs = []
    for F in (Fd, Fs):
        x, _ = ciao_tpu.Katyusha(maxit=6, batch=16, block_sampling=True)(
            x0, F=F, g=g, L=L, N=N
        )
        outs.append(x)
    _close(outs[0], outs[1], tol=1e-8)


# ---------------------------------------------------------------------------
# sparse logistic rows (ELL + hybrid) — rcv1-style L1-logistic
# ---------------------------------------------------------------------------

from ciao_tpu.oracles import (  # noqa: E402
    HybridSparseLogistic,
    LogisticRows,
    SparseLogisticELL,
)


@pytest.fixture(scope="module")
def logit_pair():
    """(dense logistic oracle, ELL logistic oracle, labels) on a
    K-sparse row matrix with ±1 labels."""
    rng = np.random.default_rng(11)
    A = np.zeros((N, n))
    for i in range(N):
        cols = rng.choice(n, size=K, replace=False)
        A[i, cols] = rng.standard_normal(K)
    x_true = rng.standard_normal(n)
    y = np.sign(A @ x_true + 0.1 * rng.standard_normal(N))
    Fd = LogisticRows(X=jnp.asarray(A), y=jnp.asarray(y))
    Fs = SparseLogisticELL.from_dense(A, y, K=K)
    assert Fs.idx.shape == (N, K) and Fs.dim == n
    return Fd, Fs, A, y


def test_logistic_ell_protocol_matches_dense(logit_pair):
    Fd, Fs, _, _ = logit_pair
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
    mask = jnp.asarray([True, False, True, True])
    _close(Fs.grad_sum_batch(x, idx, mask), Fd.grad_sum_batch(x, idx, mask))
    _close(Fs.grad_block(x, 0, 16), Fd.grad_block(x, 0, 16))
    _close(Fs.grad_batch(x, idx), Fd.grad_batch(x, idx))
    xs = jnp.asarray(np.random.default_rng(6).standard_normal((4, n)))
    _close(Fs.grad_pointwise(xs, idx), Fd.grad_pointwise(xs, idx))
    v1, g1 = Fs.value_and_grad_i(x, 7)
    v2, g2 = Fd.value_and_grad_i(x, 7)
    _close(v1, v2)
    _close(g1, g2)


def test_hybrid_logistic_protocol_matches_dense():
    A, _ = _power_law_matrix(N_H, n_H, seed=13)
    rng = np.random.default_rng(14)
    y = np.sign(A @ rng.standard_normal(n_H) + 0.1 * rng.standard_normal(N_H))
    y[y == 0] = 1.0
    Fd = LogisticRows(X=jnp.asarray(A), y=jnp.asarray(y))
    Fh = HybridSparseLogistic.from_dense(A, y, D=4)
    assert Fh.hot_width == 128 and Fh.dim == n_H
    x = jnp.asarray(np.random.default_rng(2).standard_normal(n_H))
    idx = jnp.asarray([3, 17, 99, 64], jnp.int32)
    _close(Fh.coeff_all(x), Fd.coeff_all(x))
    _close(Fh.coeff_block(x, 16, 32), Fd.coeff_block(x, 16, 32))
    _close(Fh.grad_sum_all(x), Fd.grad_sum_all(x))
    x2 = x + 0.3
    _close(Fh.grad_sum_diff(x, x2, idx), Fd.grad_sum_diff(x, x2, idx))
    _close(Fh.grad_sum_diff_block(x, x2, 32, 32),
           Fd.grad_sum_diff_block(x, x2, 32, 32))
    _close(Fh.grad_batch(x, idx), Fd.grad_batch(x, idx))
    wN = jnp.asarray(np.random.default_rng(4).standard_normal(N_H))
    _close(Fh.apply_all(wN), Fd.apply_all(wN))
    v1, g1 = Fh.value_and_grad_i(x, 7)
    v2, g2 = Fd.value_and_grad_i(x, 7)
    _close(v1, v2)
    _close(g1, g2)
    # bf16 hot block: coefficients track f32 at storage precision
    Fb = Fh.with_storage()
    assert Fb.A_hot.dtype == jnp.bfloat16
    cb = np.asarray(Fb.coeff_all(x.astype(Fh.val.dtype)))
    assert np.allclose(np.asarray(Fh.coeff_all(x)), cb, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("family", ["saga", "svrg", "katyusha"])
def test_sparse_logistic_trajectory_equals_dense(logit_pair, family):
    """Sparse logistic drives each solver down the dense oracle's exact
    trajectory (identical math, different layout)."""
    import ciao_tpu

    Fd, Fs, A, y = logit_pair
    g = NormL1(lam=jnp.asarray(1.0 / N))
    L = 0.25 * (A ** 2).sum(axis=1)
    x0 = jnp.zeros(n)
    outs = []
    for F in (Fd, Fs):
        if family == "saga":
            x, _ = ciao_tpu.SAGA(maxit=300, batch=16, block_sampling=True)(
                x0, F=F, g=g, L=L, N=N)
        elif family == "svrg":
            gam = 1.0 / (10.0 * float(L.max()))
            x, _ = ciao_tpu.SVRG(maxit=4, m=8, batch=16, block_sampling=True,
                                 gamma=gam)(x0, F=F, g=g, L=L, N=N)
        else:
            x, _ = ciao_tpu.Katyusha(maxit=6, batch=16, block_sampling=True)(
                x0, F=F, g=g, L=L, N=N)
        outs.append(x)
    _close(outs[0], outs[1], tol=1e-8)


def test_sparse_logistic_reference_acceptance():
    """The reference's L1-logistic problem (8 hardcoded 5-dim samples,
    hardcoded x_star, test_logistic_l1.jl:12-29) through the ELL oracle:
    ∞-norm error < 1e-4 — sparse layout loses nothing on the reference's
    own acceptance test."""
    import ciao_tpu
    from ciao_tpu.utils import make_logistic_l1

    prob = make_logistic_l1()
    Fs = SparseLogisticELL.from_dense(prob.X, prob.y, K=prob.X.shape[1])
    g = NormL1(lam=jnp.asarray(prob.lam))
    x, _ = ciao_tpu.Finito(maxit=9000, sweeping=2)(
        jnp.zeros(prob.X.shape[1]), F=Fs, g=g, L=prob.L, N=prob.X.shape[0])
    assert float(jnp.max(jnp.abs(x - jnp.asarray(prob.x_star)))) < 1e-4


def test_planted_sparse_lasso_solver_level():
    """The planted power-law sparse Lasso (make_sparse_lasso_ell —
    VERDICT r3 #4's end-to-end sparse story, CI miniature): KKT gives
    an exact f* (asserted), and the bench's solver plan (FISTA at the
    spectral stepsize) must reach rel 1e-3 on BOTH layouts of the same
    operator; SAGA at the reference stepsize must make matched-budget
    progress on both. Keep N ≥ 8·n — the equalized design needs the
    Wishart aspect margin (problems.py recipe note)."""
    import numpy as np

    from ciao_tpu.solvers.fb import FBCfg, fb_init, fb_run
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run
    from ciao_tpu.utils.problems import make_sparse_lasso_ell

    Np, npx = 2048, 256
    prob = make_sparse_lasso_ell(N=Np, n=npx, hot=64, k_hot=8,
                                 k_cold=4, p=16, rho=1.0, seed=0)
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    x0 = jnp.zeros(npx, jnp.float32)
    F_h = prob.hybrid

    # KKT certificate: |Aᵀr*| ≤ λ everywhere, = λ on the support
    gs = np.asarray(prob.ell.grad_sum_all(prob.x_star), np.float64) / Np
    supp = np.asarray(prob.x_star) != 0
    assert np.abs(gs).max() <= prob.lam * 1.001
    assert np.abs(np.abs(gs[supp]) - prob.lam).max() < 1e-3
    # strict dual slack off the support (the round-4 recipe: without it
    # support identification crawls)
    assert np.abs(gs[~supp]).max() <= prob.lam * 0.96

    @jax.jit
    def cost(F, z):
        r = F.coeff_all(z) / Np       # residual (coeff = N·(m − b))
        return 0.5 * jnp.sum(r * r) + prob.lam * jnp.sum(jnp.abs(z))

    @jax.jit
    def hv(F, v):
        return (F.grad_sum_all(v) - F.grad_sum_all(jnp.zeros_like(v))) / Np

    v = jax.random.normal(jax.random.PRNGKey(1), (npx,), jnp.float32)
    v = v / jnp.linalg.norm(v)
    for _ in range(8):
        w = hv(F_h, v)
        lam_h = float(jnp.linalg.norm(w))
        v = w / lam_h
    target = prob.f_star * (1 + 1e-3)
    fcfg = FBCfg(N=Np, fast=True)
    for name, F in (("ell", prob.ell), ("hybrid", F_h)):
        st = fb_init(F, g, x0, jnp.asarray(0.95 / lam_h, jnp.float32),
                     fcfg)
        st = fb_run(F, g, st, fcfg, 400)
        c = float(cost(F_h, st.x))
        assert c <= target, (name, c, prob.f_star)

    # SAGA at the reference 1/(3·Lmax) step: both layouts track each
    # other at a matched budget (trajectory is layout-independent)
    gam = jnp.asarray(1.0 / (3.0 * float(jnp.max(prob.L))), jnp.float32)
    outs = []
    for F in (prob.ell, F_h):
        cfg = SAGACfg(N=Np, sag=False, batch=256, block=True, coeff=True)
        st = saga_init(F, g, x0, gam, jax.random.PRNGKey(0), cfg)
        st = saga_run(F, g, st, cfg, 50 * (Np // 256))
        outs.append(float(cost(F_h, st.z)))
    c0 = float(cost(F_h, x0))
    assert outs[0] < 0.6 * c0 and outs[1] < 0.6 * c0, (outs, c0)
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3)
