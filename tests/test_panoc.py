"""PANOC / ZeroFPR — L-BFGS-accelerated forward-backward (beyond the
reference; the ProximalAlgorithms.jl flagship methods its users compare
against). Pins: superlinear tail vs FISTA at matched budget, machine-
precision convergence on the planted problems, tol-based early stop via
Status.CONVERGED, iterator/batch equality, complex dtypes, and the
τ-fallback safety (line search exhausts → plain FB step)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ciao_tpu
from ciao_tpu.oracles import LeastSquaresRows, LogisticRows
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers.base import Status, take
from ciao_tpu.utils.problems import make_lasso

N, n = 64, 8


@pytest.fixture(scope="module")
def lasso():
    prob = make_lasso(N=N, n=n, p=3, seed=3)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b), scale=jnp.asarray(float(N))
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    return prob, F, g


def x0(prob):
    return jnp.zeros(prob.A.shape[1], prob.A.dtype)


def test_panoc_zerofpr_converge_machine_precision(lasso):
    """60 Newton-type iterations reach the planted optimum to ~eps —
    the quasi-Newton tail FISTA cannot match (its 60-step gap is 3e-3,
    test_panoc_beats_fista)."""
    prob, F, g = lasso
    for solver in (ciao_tpu.PANOC(maxit=60), ciao_tpu.ZeroFPR(maxit=60)):
        x, it = solver(x0(prob), F=F, g=g, L=prob.L, N=N)
        assert prob.cost(np.asarray(x)) - prob.f_star < 1e-12
        assert it == 60


def test_panoc_beats_fista(lasso):
    """At a matched FULL-PASS budget (PANOC steady state ≈ 2 passes
    per iteration: one for the accepted candidate, ~0-1 extra trials),
    PANOC must land ≥ 1000x closer than FISTA."""
    prob, F, g = lasso
    xp, _ = ciao_tpu.PANOC(maxit=50)(x0(prob), F=F, g=g, L=prob.L, N=N)
    xf, _ = ciao_tpu.FISTA(maxit=100)(x0(prob), F=F, g=g, L=prob.L, N=N)
    gap_p = prob.cost(np.asarray(xp)) - prob.f_star
    gap_f = prob.cost(np.asarray(xf)) - prob.f_star
    assert gap_p * 1000 < gap_f, (gap_p, gap_f)


def test_panoc_tol_early_stop(lasso):
    prob, F, g = lasso
    solver = ciao_tpu.PANOC(maxit=500, tol=1e-10)
    x, it = solver(x0(prob), F=F, g=g, L=prob.L, N=N)
    assert it < 500
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-12
    # the iterator surfaces the stop as exhaustion (status CONVERGED)
    states = list(take(iter(solver.iterator(x0(prob), F=F, g=g,
                                            L=prob.L, N=N)), 500))
    assert len(states) < 500
    assert int(states[-1].status) == Status.CONVERGED


def test_panoc_iterator_matches_batch(lasso):
    prob, F, g = lasso
    solver = ciao_tpu.PANOC(maxit=7)
    it = solver.iterator(x0(prob), F=F, g=g, L=prob.L, N=N)
    states = list(take(iter(it), 7))
    x_batch, _ = solver(x0(prob), F=F, g=g, L=prob.L, N=N)
    np.testing.assert_array_equal(np.asarray(states[-1].solution),
                                  np.asarray(x_batch))
    # maxit=1 == init state (framework-wide convention)
    x1, _ = solver.__class__(maxit=1)(x0(prob), F=F, g=g, L=prob.L, N=N)
    np.testing.assert_array_equal(np.asarray(states[0].solution),
                                  np.asarray(x1))


def test_panoc_adaptive_no_smoothness_info(lasso):
    """No γ and no L auto-enables the adaptive mode: γ₀ from the
    finite-difference probe, then in-step descent-lemma backtracking —
    must converge to the same precision as the L-informed run."""
    prob, F, g = lasso
    for solver in (ciao_tpu.PANOC(maxit=80), ciao_tpu.ZeroFPR(maxit=80)):
        x, _ = solver(x0(prob), F=F, g=g, N=N)
        assert prob.cost(np.asarray(x)) - prob.f_star < 1e-12


def test_panoc_adaptive_recovers_from_bad_gamma(lasso):
    """adaptive=True with a 200x too-large explicit γ: the descent-lemma
    backtracking must halve γ into the valid range and still converge
    (without adaptive the same γ leaves the solver crawling through
    τ=0 fallback steps)."""
    prob, F, g = lasso
    bad = 200.0 / float(np.mean(prob.L))
    xa, _ = ciao_tpu.PANOC(gamma=bad, adaptive=True, maxit=80)(
        x0(prob), F=F, g=g, N=N
    )
    assert prob.cost(np.asarray(xa)) - prob.f_star < 1e-12


def test_dp_panoc_adaptive_matches_single_chip(lasso):
    """Adaptive DPPANOC ≡ adaptive single-chip: the γ-backtracking's
    while_loop condition is replicated (the value probe psums), so the
    halving schedule — and hence the whole trajectory — must agree."""
    from ciao_tpu.parallel import DPPANOC, make_mesh, shard_finite_sum

    prob, F, g = lasso
    z0 = x0(prob)
    mesh = make_mesh()
    Fd = shard_finite_sum(F, mesh)
    x_dp, _ = DPPANOC(mesh=mesh, maxit=40)(z0, F=Fd, g=g, N=N)
    x_sc, _ = ciao_tpu.PANOC(maxit=40)(z0, F=F, g=g, N=N)
    np.testing.assert_allclose(np.asarray(x_dp), np.asarray(x_sc),
                               rtol=1e-9, atol=1e-12)


def test_panoc_complex_dtype():
    prob = make_lasso(N=N, n=n, p=3, seed=3, dtype=np.complex128)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b), scale=jnp.asarray(float(N))
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    for solver in (ciao_tpu.PANOC(maxit=80), ciao_tpu.ZeroFPR(maxit=80)):
        x, _ = solver(jnp.zeros(n, prob.A.dtype), F=F, g=g, L=prob.L, N=N)
        assert x.dtype == prob.A.dtype
        assert prob.cost(np.asarray(x)) - prob.f_star < 1e-10


def test_panoc_logistic_l1():
    """Reference logistic+L1 problem (test_logistic_l1.jl data via
    utils.problems): PANOC reaches the reference tolerance in a few
    dozen iterations."""
    from ciao_tpu.utils.problems import make_logistic_l1

    prob = make_logistic_l1()
    F = LogisticRows(
        X=jnp.asarray(prob.X), y=jnp.asarray(prob.y),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    z0 = jnp.zeros(prob.X.shape[1], jnp.asarray(prob.X).dtype)
    x, _ = ciao_tpu.PANOC(maxit=80)(z0, F=F, g=g, L=prob.L,
                                    N=prob.X.shape[0])
    assert np.max(np.abs(np.asarray(x) - prob.x_star)) < 1e-6


def test_panoc_gamma_only_and_ls_fallback(lasso):
    """Explicit γ without L (σ from the conservative default) still
    converges; a deliberately too-large γ exercises the τ→0 fallback
    every step without diverging (bounded line search)."""
    prob, F, g = lasso
    gam = 0.95 / float(np.mean(prob.L))
    x, _ = ciao_tpu.PANOC(gamma=gam, maxit=60)(x0(prob), F=F, g=g, N=N)
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-12
    # γ = 4/L violates the FB decrease; iterates must remain finite AND
    # the thrash gauge must surface the τ→0-every-step burn
    with pytest.warns(UserWarning, match="FBE"):
        xb, _ = ciao_tpu.PANOC(gamma=4.0 / float(np.mean(prob.L)), maxit=30)(
            x0(prob), F=F, g=g, L=prob.L, N=N
        )
    assert np.all(np.isfinite(np.asarray(xb)))


def test_dp_panoc_matches_single_chip(lasso):
    """DPPANOC/DPZeroFPR on the 8-device mesh: deterministic method —
    the sharded trajectory must EQUAL the single-chip one (the FBE
    psums are the only cross-device ops)."""
    from ciao_tpu.parallel import (
        DPPANOC, DPZeroFPR, make_mesh, shard_finite_sum,
    )

    prob, F, g = lasso
    z0 = x0(prob)
    mesh = make_mesh()
    Fd = shard_finite_sum(F, mesh)
    for DP, SC in ((DPPANOC, ciao_tpu.PANOC), (DPZeroFPR, ciao_tpu.ZeroFPR)):
        x_dp, _ = DP(mesh=mesh, maxit=40)(z0, F=Fd, g=g, L=prob.L, N=N)
        x_sc, _ = SC(maxit=40)(z0, F=F, g=g, L=prob.L, N=N)
        np.testing.assert_allclose(np.asarray(x_dp), np.asarray(x_sc),
                                   rtol=1e-9, atol=1e-12)
        assert prob.cost(np.asarray(x_dp)) - prob.f_star < 1e-12
    with pytest.raises(ValueError, match="divide evenly"):
        DPPANOC(mesh=mesh, maxit=2)(z0, F=Fd, g=g, L=prob.L, N=N - 1)


def test_tp_panoc_matches_single_chip(lasso):
    """TPPANOC/TPZeroFPR on a (4 data x 2 model) mesh: the 2-D-sharded
    trajectory must equal the single-chip one (margin psum over
    "model", value/gradient psums over "data", replicated line search);
    non-separable proxes are rejected."""
    from ciao_tpu.parallel import (
        TPPANOC, TPZeroFPR, make_mesh_2d, shard_finite_sum_2d,
    )
    from ciao_tpu.prox import NormL2

    prob, F, g = lasso
    z0 = x0(prob)
    mesh2 = make_mesh_2d(4, 2)
    F2 = shard_finite_sum_2d(F, mesh2)
    for TP, SC in ((TPPANOC, ciao_tpu.PANOC), (TPZeroFPR, ciao_tpu.ZeroFPR)):
        x_tp, _ = TP(mesh=mesh2, maxit=40)(z0, F=F2, g=g, L=prob.L, N=N)
        x_sc, _ = SC(maxit=40)(z0, F=F, g=g, L=prob.L, N=N)
        np.testing.assert_allclose(np.asarray(x_tp), np.asarray(x_sc),
                                   rtol=1e-9, atol=1e-12)
    with pytest.raises(ValueError, match="separable"):
        TPPANOC(mesh=mesh2)(z0, F=F2, g=NormL2(lam=jnp.asarray(1.0)),
                            L=prob.L, N=N)


def test_panoc_fused_fbe_matches_xla():
    """The one-pass fused FBE read (ops.coeff_value_apply_all) must
    reproduce the XLA value_sum_and_grad_sum_all for every in-kernel
    oracle mode (LSQ/logistic/Huber) and int8 storage, and the fused
    PANOC trajectory must match the XLA one."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from ciao_tpu.oracles import HuberRows
    from ciao_tpu.ops.fused_block import (
        _pick_tile, coeff_value_apply_all, oracle_scalar_consts,
        rows_scale_row,
    )
    from ciao_tpu.prox import Zero
    from ciao_tpu.solvers.panoc import PANOCCfg, panoc_init, panoc_run
    from ciao_tpu.utils.problems import make_lasso

    Np, npix = 512, 128
    rng = np.random.default_rng(5)
    A = jnp.asarray(rng.normal(size=(Np, npix)), jnp.float32)
    bv = jnp.asarray(rng.normal(size=Np), jnp.float32)
    yv = jnp.asarray(np.sign(rng.normal(size=Np)), jnp.float32)
    u = jnp.asarray(rng.normal(size=npix), jnp.float32)
    from ciao_tpu.oracles import LogisticRows as LR

    oracles = [
        LeastSquaresRows(A=A, b=bv, scale=jnp.asarray(np.float32(Np))),
        LR(X=A, y=yv),
        HuberRows(A=A, b=bv, delta=jnp.asarray(np.float32(0.7)),
                  scale=jnp.asarray(np.float32(2.0))),
        LeastSquaresRows(
            A=A, b=bv, scale=jnp.asarray(np.float32(Np))
        ).with_storage(jnp.int8),
    ]
    for F in oracles:
        rows, offs = F.coeff_rows_data()
        scale, mode, _, aux = oracle_scalar_consts(F, Zero())
        tile = _pick_tile(Np, Np, npix, esize=rows.dtype.itemsize)
        with pltpu.force_tpu_interpret_mode():
            val, c1, gsum = coeff_value_apply_all(
                rows, offs[None, :], u[None, :],
                jnp.stack([scale, mode, aux])[None, :], tile,
                rs1=rows_scale_row(F),
            )
        val_x, gsum_x = F.value_sum_and_grad_sum_all(u)
        # int8 rows: the kernel multiplies in bf16 (framework-wide int8
        # contract), the XLA reference dequants to f32 — bf16-level gap
        quant = rows.dtype == jnp.int8
        np.testing.assert_allclose(float(val[0, 0]), float(val_x),
                                   rtol=2e-3 if quant else 2e-5)
        np.testing.assert_allclose(
            np.asarray(gsum[0]), np.asarray(gsum_x),
            rtol=8e-3 if quant else 2e-4,
            atol=np.max(np.abs(gsum_x)) * (4e-3 if quant else 1e-5),
        )

    # full fused-vs-XLA PANOC trajectory
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(np.float32(Np)),
    )
    g = NormL1(lam=jnp.asarray(np.float32(prob.lam)))
    gamma = jnp.asarray(0.95 / np.mean(prob.L), jnp.float32)
    sigma = jnp.asarray(0.5 * 0.05 / (2 * 0.95 / np.mean(prob.L)),
                        jnp.float32)
    z0 = jnp.zeros(npix, jnp.float32)
    for zfpr in (False, True):
        cfg = PANOCCfg(N=Np, zerofpr=zfpr)
        st_x = panoc_run(F, g, panoc_init(F, g, z0, gamma, sigma, cfg),
                         cfg, 15)
        cfg_f = cfg._replace(fused=True)
        with pltpu.force_tpu_interpret_mode():
            st_f = panoc_run(F, g,
                             panoc_init(F, g, z0, gamma, sigma, cfg_f),
                             cfg_f, 15)
        np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_x.z),
                                   rtol=1e-4, atol=1e-6)


def test_value_sum_and_grad_sum_all_consistent(lasso):
    """The fused value+grad full pass (PANOC's FBE primitive) must agree
    with the separate reductions on every row-structured oracle."""
    import jax

    prob, F, g = lasso
    x = jnp.asarray(np.random.default_rng(0).normal(size=n))
    val, gsum = F.value_sum_and_grad_sum_all(x)
    vals, grads = F.value_and_grad_all(x)
    np.testing.assert_allclose(float(val), float(jnp.sum(vals)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gsum),
                               np.asarray(jnp.sum(grads, axis=0)),
                               rtol=1e-10, atol=1e-12)

    from ciao_tpu.oracles import HuberRows
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(16, n)))
    b = jnp.asarray(rng.normal(size=16))
    yv = jnp.asarray(np.sign(rng.normal(size=16)))
    for O in (HuberRows(A=A, b=b, delta=jnp.asarray(0.7)),
              LogisticRows(X=A, y=yv)):
        val, gsum = O.value_sum_and_grad_sum_all(x)
        vals, grads = O.value_and_grad_all(x)
        np.testing.assert_allclose(float(val), float(jnp.sum(vals)),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gsum),
                                   np.asarray(jnp.sum(grads, axis=0)),
                                   rtol=1e-10, atol=1e-12)


import dataclasses

from ciao_tpu.oracles.base import register_oracle


@register_oracle
@dataclasses.dataclass(frozen=True)
class _FloorNoiseOracle:
    """Oracle wrapper that adds a deterministic bf16-floor-scale jitter
    to the objective VALUE only — the exact mechanism of the PERF.md
    narrow-storage thrash (on TPU the fused kernel's bf16 multiply
    paths make the FBE value noisy at ~2^-8 relative, so near the floor
    the σ-decrease test cannot resolve it and the line search collapses
    τ every step). The CPU XLA path computes the quantized operator
    EXACTLY (deterministic value), so a with_storage('bf16') run
    converges cleanly here — the injection reproduces the chip-side
    behavior for a platform-independent test of the guard."""

    F: object
    amp: jnp.ndarray

    @property
    def num_terms(self):
        return self.F.num_terms

    def value_sum_and_grad_sum_all(self, u):
        v, gsum = self.F.value_sum_and_grad_sum_all(u)
        h = jnp.sum(u * jnp.asarray(12345.678, u.dtype))  # stateless jitter
        noise = self.amp * jnp.sin(h * 1e4) * (1.0 + jnp.abs(v))
        gscale = 1.0 + jnp.linalg.norm(gsum) / jnp.sqrt(1.0 * u.size)
        gnoise = self.amp * gscale * jnp.sin(
            h * 7e3 + jnp.arange(u.size, dtype=u.dtype)
        )
        return v + noise, gsum + gnoise


def test_panoc_thrash_warning_on_value_noise_floor():
    """At a value-noise floor (the narrow-storage symptom, PERF.md) the
    PANOC line search burns multiple FBE evaluations per step; at a
    matched 60-iteration budget the noisy run must surface the
    documented warning while the exact (f32) run — which reaches 1e-12
    by then (test_panoc_zerofpr_converge_machine_precision) — stays
    silent with its gauge at ~1 eval/step (VERDICT r2 #8). Grinding an
    exact run long PAST machine precision raises the gauge too, which
    is the correct diagnosis: any unresolvable floor, dtype or storage,
    is the same symptom."""
    import warnings

    prob = make_lasso(N=256, n=32, p=5, seed=7, dtype=np.float32)
    z0 = jnp.zeros(32, jnp.float32)
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(np.float32(256)),
    )

    def run(amp):
        Fr = _FloorNoiseOracle(F=F, amp=jnp.asarray(amp, jnp.float32)) \
            if amp else F
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ciao_tpu.PANOC(maxit=60)(z0, F=Fr, g=g, L=prob.L, N=256)
        return [w for w in rec if "accuracy floor" in str(w.message)]

    assert run(2.0 ** -8), "a bf16-floor-noise deep run must warn"
    assert not run(0.0), "the exact run must stay silent"
