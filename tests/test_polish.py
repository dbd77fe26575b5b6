"""Compensated-gradient FISTA polish (solvers/polish.py) — the
high-accuracy endgame below the f32 stochastic floors. Pins: the
chunked two-sum gradient equals the oracle gradient, the compensation
really buys accuracy on an adversarial accumulation, the polish drives
a planted lasso to its f32 fixed point, the power-iteration λmax bound
is step-safe, and the storage/shape guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu import LeastSquaresRows, NormL1
from ciao_tpu.solvers.polish import (
    _two_sum,
    fista_polish,
    grad_mean_chunked,
    lsq_power_lmax,
)
from ciao_tpu.utils.problems import make_lasso

N, n = 4096, 64


@pytest.fixture(scope="module")
def lasso():
    prob = make_lasso(N=N, n=n, p=8, seed=0, dtype=np.float32,
                      well_conditioned=True)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(N), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    return prob, F, g


def test_chunked_grad_matches_oracle(lasso):
    _, F, _ = lasso
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    gc = grad_mean_chunked(F, x, 512)
    gref = F.grad_sum_all(x) / N
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gref),
                               rtol=2e-5, atol=1e-6)
    # chunk granularity must not change the result beyond f32 noise
    gc2 = grad_mean_chunked(F, x, 128)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc2),
                               rtol=2e-5, atol=1e-6)


def test_two_sum_beats_naive_accumulation():
    """Adversarial cross-chunk accumulation: one huge partial followed
    by many tiny ones — the naive f32 running sum drops them, the
    compensated carry keeps every bit (this is the mechanism that
    removes the √N·eps gradient floor at the 10M scale)."""
    parts = np.full(4096, 1.0, np.float32)
    parts[0] = 2.0 ** 24  # f32: 2^24 + 1 == 2^24 exactly

    def run(ps):
        def body(carry, p):
            hi, lo, naive = carry
            hi, lo = _two_sum(hi, lo, p)
            return (hi, lo, naive + p), None

        z = jnp.zeros((), jnp.float32)
        (hi, lo, naive), _ = jax.lax.scan(body, (z, z, z), ps)
        return hi + lo, naive

    comp, naive = map(float, jax.jit(run)(jnp.asarray(parts)))
    exact = float(np.sum(parts.astype(np.float64)))
    assert naive == 2.0 ** 24                  # all 4095 units lost
    assert abs(comp - exact) <= 2.0            # compensated keeps them
    assert abs(comp - exact) < abs(naive - exact) / 1000


def test_polish_reaches_planted_optimum(lasso):
    prob, F, g = lasso
    rng = np.random.default_rng(2)
    # start from a mediocre point well off the optimum
    x0 = jnp.asarray(prob.x_star + 0.05 * rng.standard_normal(n),
                     jnp.float32)
    lmax = float(lsq_power_lmax(F, jax.random.PRNGKey(1), iters=8))
    res = fista_polish(F, g, x0, 0.9 / lmax, steps=400, chunk=512)
    gap = prob.cost(np.asarray(res.x)) - prob.f_star
    assert gap < 1e-5, gap
    # converged to the f32 prox fixed point: residual at roundoff scale
    assert float(res.fp_res) < 1e-3 * lmax * float(
        jnp.linalg.norm(res.x) + 1.0)
    # one more launch stays put (monotone at the fixed point)
    res2 = fista_polish(F, g, res.x, 0.9 / lmax, steps=16, chunk=512)
    gap2 = prob.cost(np.asarray(res2.x)) - prob.f_star
    assert gap2 < max(1e-5, 1.5 * gap)


def test_power_lmax_is_step_safe(lasso):
    _, F, _ = lasso
    A = np.asarray(F.A, np.float64)
    lam_true = float(np.linalg.eigvalsh((A.T @ A)).max())  # scale/N = 1
    lam_hat = float(lsq_power_lmax(F, jax.random.PRNGKey(2), iters=8))
    # power iteration underestimates from below; η = 0.9/λ̂ must stay
    # below 1/λ_true for the descent guarantee
    assert 0.9 / lam_hat <= 1.0 / lam_true * 1.05
    assert lam_hat > 0.5 * lam_true


def test_dp_polish_matches_single_chip(lasso):
    """DPFISTA(polish_chunk=...): per-shard compensated chunked sums +
    one psum must reproduce the plain DP trajectory within f32 noise
    (on CPU both are near-exact) and reach the planted optimum."""
    import ciao_tpu
    from ciao_tpu.parallel import DPFISTA, make_mesh, shard_finite_sum

    prob, F, g = lasso
    x0 = jnp.zeros(n, jnp.float32)
    mesh = make_mesh()
    Fd = shard_finite_sum(F, mesh)
    x_plain, _ = DPFISTA(mesh=mesh, maxit=400)(x0, F=Fd, g=g, L=prob.L)
    x_comp, _ = DPFISTA(mesh=mesh, maxit=400, polish_chunk=64)(
        x0, F=Fd, g=g, L=prob.L)
    np.testing.assert_allclose(np.asarray(x_comp), np.asarray(x_plain),
                               rtol=1e-4, atol=1e-5)
    x_sc, _ = ciao_tpu.FISTA(maxit=400)(x0, F=F, g=g, L=prob.L, N=N)
    np.testing.assert_allclose(np.asarray(x_comp), np.asarray(x_sc),
                               rtol=1e-4, atol=1e-5)
    gap = prob.cost(np.asarray(x_comp)) - prob.f_star
    assert gap < 1e-3 * (prob.cost(np.zeros(n)) - prob.f_star)
    # guards: chunk must divide the shard; int8 rows rejected
    with pytest.raises(ValueError, match="divide the per-device"):
        DPFISTA(mesh=mesh, maxit=2, polish_chunk=77)(
            x0, F=Fd, g=g, L=prob.L)
    with pytest.raises(ValueError, match="int8"):
        DPFISTA(mesh=mesh, maxit=2, polish_chunk=64)(
            x0, F=shard_finite_sum(F.with_storage("int8"), mesh),
            g=g, L=prob.L)


def test_polish_guards(lasso):
    _, F, g = lasso
    x = jnp.zeros(n, jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        grad_mean_chunked(F, x, 1000)
    with pytest.raises(ValueError, match="int8"):
        grad_mean_chunked(F.with_storage("int8"), x, 512)


def test_block_protocol_chunked_grad_matches_oracle():
    """grad_mean_chunked_blocks (the sparse layouts' polish gradient)
    ≡ the oracle's full gradient, for dense AND both sparse layouts —
    and fista_polish(block_protocol=True) takes the same step as the
    dense-rows path on a dense oracle."""
    from ciao_tpu.solvers.polish import (
        fista_polish, grad_mean_chunked, grad_mean_chunked_blocks,
    )
    from ciao_tpu.utils.problems import make_sparse_lasso_ell

    rng = np.random.default_rng(3)
    x = jnp.asarray(0.1 * rng.standard_normal(256), jnp.float32)
    sp = make_sparse_lasso_ell(N=2048, n=256, hot=64, k_hot=8, k_cold=4,
                               p=16, rho=1.0, seed=0)
    for name, F in (("ell", sp.ell), ("hybrid", sp.hybrid)):
        gb = grad_mean_chunked_blocks(F, x, 256)
        gref = F.grad_sum_all(x) / 2048
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gref),
                                   rtol=3e-5, atol=3e-5, err_msg=name)
    # dense oracle: both protocols agree step-for-step
    prob = make_lasso(N=N, n=n, p=8, seed=0, dtype=np.float32,
                      well_conditioned=True)
    F = LeastSquaresRows(A=jnp.asarray(prob.A, jnp.float32),
                         b=jnp.asarray(prob.b, jnp.float32),
                         scale=jnp.asarray(float(N), jnp.float32))
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    x0 = jnp.zeros(n, jnp.float32)
    r1 = fista_polish(F, g, x0, 1e-6, steps=5, chunk=512)
    r2 = fista_polish(F, g, x0, 1e-6, steps=5, chunk=512,
                      block_protocol=True)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               rtol=1e-6, atol=1e-8)
