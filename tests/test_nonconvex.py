"""Nonconvex end-to-end acceptance (reference README.md:6-12 advertises
f_i possibly NONCONVEX and g possibly nonconvex — its test suite never
exercises either; these tests define our contracts).

* nonconvex smooth f_i: the Welsch/Leclerc robust loss
  f_i(x) = (σ²/2)·(1 − exp(−r_i²/σ²)), r_i = a_i·x − b_i — smooth,
  bounded, NONconvex — through the generic autodiff ``CustomOracle``
  (arrays-of-data protocol; every derived entry point the solvers use
  comes from ``value_and_grad_i`` defaults). SARAH (the SPIDER-rate
  nonconvex solver) must reach a stationary point that recovers a
  planted signal through 20 % gross outliers where least squares is
  dragged far off.
* nonconvex g: the MCP penalty (firm threshold) + SARAH on planted
  sparse regression — exact support recovery and near-oracle-refit
  accuracy (the unbiasedness MCP has and L1 lacks).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ciao_tpu.oracles import CustomOracle, LeastSquaresRows
from ciao_tpu.prox import MCP
from ciao_tpu.solvers.sarah import SARAH


def _planted_outlier_problem(N=256, n=16, frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((N, n)).astype(np.float32)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = A @ x_true + 0.01 * rng.standard_normal(N).astype(np.float32)
    out = rng.choice(N, size=int(frac * N), replace=False)
    b[out] += 50.0 * rng.standard_normal(out.size).astype(np.float32)
    return A, b, x_true


def test_nonconvex_smooth_welsch_loss_sarah():
    A, b, x_true = _planted_outlier_problem()
    N, n = A.shape
    sigma = 1.0

    def welsch(x, d):
        r = jnp.dot(d["a"], x) - d["b"]
        return 0.5 * sigma**2 * (1.0 - jnp.exp(-(r * r) / sigma**2))

    F = CustomOracle(
        data={"a": jnp.asarray(A), "b": jnp.asarray(b)}, fun=welsch
    )
    # Hessian bound at r=0: ‖a_i‖² (the loss only gets FLATTER outward)
    L = (A * A).sum(axis=1)
    # warm start from a crude median-ish point to stay in the signal's
    # basin (the loss is nonconvex — cold starts may find outlier modes)
    x0 = jnp.asarray(
        np.linalg.lstsq(A, np.clip(b, -5, 5), rcond=None)[0], jnp.float32
    )
    x, _ = SARAH(maxit=200, m=32, batch=8, block_sampling=True)(
        x0, F=F, L=L, N=N
    )
    x = np.asarray(x, np.float64)
    # (a) robust recovery: close to the planted signal...
    assert np.max(np.abs(x - x_true)) < 0.05
    # ...where plain least squares is dragged off by the outliers
    x_ls = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.max(np.abs(x_ls - x_true)) > 5 * np.max(np.abs(x - x_true))
    # (b) stationarity of the NONCONVEX objective at the solution
    gn = float(jnp.linalg.norm(F.grad_sum_all(jnp.asarray(x, jnp.float32)))) / N
    assert gn < 1e-4


def test_nonconvex_mcp_penalty_sarah_support_recovery():
    rng = np.random.default_rng(3)
    N, n, k = 512, 64, 6
    A = (rng.standard_normal((N, n)) / np.sqrt(N)).astype(np.float32)
    x_true = np.zeros(n, np.float32)
    sup = rng.choice(n, size=k, replace=False)
    x_true[sup] = (3.0 + rng.random(k)).astype(np.float32) * rng.choice(
        [-1, 1], size=k
    )
    b = A @ x_true + 0.01 * rng.standard_normal(N).astype(np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(A), b=jnp.asarray(b), scale=jnp.asarray(float(N))
    )
    L = float(N) * (A * A).sum(axis=1)
    g = MCP(lam=jnp.asarray(0.05, jnp.float32),
            beta=jnp.asarray(3.0, jnp.float32))
    x, _ = SARAH(maxit=800, m=16, batch=32, block_sampling=True)(
        jnp.zeros(n, jnp.float32), F=F, g=g, L=L
    )
    x = np.asarray(x, np.float64)
    assert set(np.flatnonzero(np.abs(x) > 1e-3)) == set(sup.tolist())
    # MCP is unbiased past γλ: the nonzeros match the ORACLE REFIT
    refit = np.linalg.lstsq(A[:, sup], b, rcond=None)[0]
    assert np.max(np.abs(x[sup] - refit)) < 1e-2


def test_nonconvex_panoc_welsch_and_mcp():
    """PANOC/ZeroFPR are explicitly nonconvex-capable (the FBE theory
    only needs L-smooth f and prox-bounded g): pin (a) stationarity +
    robust recovery on the Welsch loss through the generic autodiff
    oracle (~200 iterations — the loss plateaus around the outlier
    residuals, so the envelope descent is slow before the signal basin
    tightens), (b) MCP exact support + oracle-refit match."""
    from ciao_tpu.solvers.panoc import PANOC, ZeroFPR

    # (a) Welsch robust loss (nonconvex smooth f)
    A, b, x_true = _planted_outlier_problem()
    N, n = A.shape
    sigma = 1.0

    def welsch(x, d):
        r = jnp.dot(d["a"], x) - d["b"]
        return 0.5 * sigma**2 * (1.0 - jnp.exp(-(r * r) / sigma**2))

    F = CustomOracle(
        data={"a": jnp.asarray(A), "b": jnp.asarray(b)}, fun=welsch
    )
    L = (A * A).sum(axis=1)
    x0 = jnp.asarray(
        np.linalg.lstsq(A, np.clip(b, -5, 5), rcond=None)[0], jnp.float32
    )
    x, _ = PANOC(maxit=200)(x0, F=F, L=L, N=N)
    x = np.asarray(x, np.float64)
    assert np.max(np.abs(x - x_true)) < 0.05
    gn = float(jnp.linalg.norm(F.grad_sum_all(jnp.asarray(x, jnp.float32)))) / N
    assert gn < 1e-5

    # (b) MCP penalty (nonconvex g) — support recovery + unbiased refit
    rng = np.random.default_rng(3)
    N, n, k = 512, 64, 6
    A = (rng.standard_normal((N, n)) / np.sqrt(N)).astype(np.float32)
    x_true = np.zeros(n, np.float32)
    sup = rng.choice(n, size=k, replace=False)
    x_true[sup] = (3.0 + rng.random(k)).astype(np.float32) * rng.choice(
        [-1, 1], size=k
    )
    b = A @ x_true + 0.01 * rng.standard_normal(N).astype(np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(A), b=jnp.asarray(b), scale=jnp.asarray(float(N))
    )
    # spectral modulus of f = (1/N)·Σ f_i = λmax(AᵀA) (rows are scaled
    # 1/√N, so AᵀA ≈ I); the row-moduli mean overshoots by ~n here
    lam_max = float(np.linalg.eigvalsh(A.T @ A).max())
    g = MCP(lam=jnp.asarray(0.05, jnp.float32),
            beta=jnp.asarray(3.0, jnp.float32))
    for solver in (PANOC(gamma=0.95 / lam_max, maxit=120),
                   ZeroFPR(gamma=0.95 / lam_max, maxit=120)):
        x, _ = solver(jnp.zeros(n, jnp.float32), F=F, g=g)
        x = np.asarray(x, np.float64)
        assert set(np.flatnonzero(np.abs(x) > 1e-3)) == set(sup.tolist())
        refit = np.linalg.lstsq(A[:, sup], b, rcond=None)[0]
        assert np.max(np.abs(x[sup] - refit)) < 1e-2
