"""Fused Pallas block-kernel tests (interpret mode on CPU).

Validates ciao_tpu.ops.fused_block against the straight-line XLA math it
replaces: the SAGA table refresh (reference SAGA_basic.jl:61-65) and the
Finito table refresh (reference Finito_basic.jl:110-117), including the
in-place aliasing contract (rows outside the block untouched).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.ops import finito_block_update, fused_block_available, saga_block_update
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers.finito import FinitoCfg, finito_basic_init, finito_run
from ciao_tpu.utils.problems import make_lasso

N, n, B = 512, 256, 128


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, n), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (N,), jnp.float32)
    s = jax.random.normal(jax.random.fold_in(key, 2), (N, n), jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 3), (n,), jnp.float32)
    gamma = jax.random.uniform(
        jax.random.fold_in(key, 4), (N,), jnp.float32, 0.5, 2.0
    )
    return A, b, s, z, gamma


@pytest.mark.parametrize("start", [0, 128, N - B])
def test_saga_block_update(data, start):
    A, b, s, z, _ = data
    scale = jnp.full((1, 1), float(N), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        s_new, innov = saga_block_update(A, b[:, None], s + 0, z[None, :],
                                         jnp.asarray(start), scale, B)
    r = A[start:start + B] @ z - b[start:start + B]
    G = (N * r)[:, None] * A[start:start + B]
    np.testing.assert_allclose(
        np.asarray(innov), np.asarray(jnp.sum(G - s[start:start + B], axis=0)),
        rtol=2e-4, atol=1e-1,
    )
    np.testing.assert_allclose(
        np.asarray(s_new[start:start + B]), np.asarray(G), rtol=2e-4, atol=1e-2
    )
    # aliasing contract: rows outside the block untouched
    mask = np.ones(N, bool)
    mask[start:start + B] = False
    np.testing.assert_array_equal(np.asarray(s_new[mask]), np.asarray(s[mask]))


def test_finito_block_update(data):
    A, b, s, z, gamma = data
    start = 256
    hat = jnp.asarray(0.37, jnp.float32)
    scalars = jnp.asarray([[float(N), 1.0 / N, 0.37]], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        s_new, innov = finito_block_update(
            A, b[:, None], s + 0, gamma[:, None], z[None, :],
            jnp.asarray(start), scalars, B,
        )
    sl = slice(start, start + B)
    r = A[sl] @ z - b[sl]
    G = (N * r)[:, None] * A[sl]
    s_ref = z[None, :] - (gamma[sl] / N)[:, None] * G
    innov_ref = jnp.sum((s_ref - s[sl]) * (hat / gamma[sl])[:, None], axis=0)
    np.testing.assert_allclose(np.asarray(innov), np.asarray(innov_ref),
                               rtol=2e-4, atol=1e-1)
    np.testing.assert_allclose(np.asarray(s_new[sl]), np.asarray(s_ref),
                               rtol=2e-4, atol=1e-2)


def test_fused_finito_solver_matches_xla_path():
    """Full Finito-basic run: fused kernel vs the XLA dynamic-slice path
    must produce the same trajectory (same schedule, same math)."""
    Np, npix, Bp = 64, 128, 16
    prob = make_lasso(N=Np, n=npix, p=4, seed=1, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(0)

    def run(fused):
        cfg = FinitoCfg(N=Np, batch=Bp, sweeping=2, alpha=0.999, fused=fused)
        state = finito_basic_init(F, g, jnp.zeros(npix, jnp.float32), gamma, key, cfg)
        return finito_run(F, g, state, cfg, "basic", 30).z

    z_xla = run(False)
    with pltpu.force_tpu_interpret_mode():
        z_fused = run(True)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_xla),
                               rtol=1e-4, atol=1e-5)


def test_availability_gate():
    assert not fused_block_available(100, 256, 10, jnp.float32)  # N%tile
    assert not fused_block_available(512, 100, 128, jnp.float32)  # n%128
    assert not fused_block_available(512, 256, 128, jnp.float64)  # dtype
    # (on CPU CI the backend gate also returns False for valid shapes)
    if jax.default_backend() != "tpu":
        assert not fused_block_available(512, 256, 128, jnp.float32)


# ---------------------------------------------------------------------------
# coefficient-compressed tables: exact re-parameterization checks
# ---------------------------------------------------------------------------

def test_saga_coeff_matches_full_table():
    """table='coeff' must reproduce table='full' trajectories exactly
    (the compression is algebraic, not approximate). f64 for tightness."""
    from ciao_tpu.solvers.saga import SAGA

    prob = make_lasso(N=32, n=8, p=3, seed=2)
    F = LeastSquaresRows(A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
                         scale=jnp.asarray(32.0))
    g = NormL1(lam=jnp.asarray(prob.lam))
    x0 = jnp.zeros(8)
    a, _ = SAGA(maxit=300, table="full")(x0, F=F, g=g, L=prob.L)
    c, _ = SAGA(maxit=300, table="coeff")(x0, F=F, g=g, L=prob.L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-12, atol=1e-12)
    # block sampling mode too
    a2, _ = SAGA(maxit=300, table="full", block_sampling=True, batch=8)(
        x0, F=F, g=g, L=prob.L
    )
    c2, _ = SAGA(maxit=300, table="coeff", block_sampling=True, batch=8)(
        x0, F=F, g=g, L=prob.L
    )
    np.testing.assert_allclose(np.asarray(a2), np.asarray(c2), rtol=1e-12, atol=1e-12)


def test_finito_coeff_matches_full_table():
    from ciao_tpu.solvers.finito import Finito

    prob = make_lasso(N=32, n=8, p=3, seed=2)
    F = LeastSquaresRows(A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
                         scale=jnp.asarray(32.0))
    g = NormL1(lam=jnp.asarray(prob.lam))
    x0 = jnp.zeros(8)
    for sweeping in (2, 3):
        a, _ = Finito(maxit=200, sweeping=sweeping, minibatch=(True, 8),
                      table="full")(x0, F=F, g=g, L=prob.L)
        c, _ = Finito(maxit=200, sweeping=sweeping, minibatch=(True, 8),
                      table="coeff")(x0, F=F, g=g, L=prob.L)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-10, atol=1e-10)


def test_finito_coeff_bad_config_raises():
    from ciao_tpu.solvers.finito import Finito

    prob = make_lasso(N=32, n=8, p=3, seed=2)
    F = LeastSquaresRows(A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
                         scale=jnp.asarray(32.0))
    with pytest.raises(ValueError, match="coeff"):
        Finito(maxit=10, sweeping=1, table="coeff")(
            jnp.zeros(8), F=F, g=NormL1(lam=jnp.asarray(1.0)), L=prob.L
        )


def test_saga_fused_multistep_matches_stepwise():
    """The K-steps-per-launch fused kernel must reproduce the stepwise
    coeff path: identical sampling stream (split/randint parity) and the
    same math, so trajectories agree to matmul precision."""
    from ciao_tpu.solvers.saga import SAGA, SAGACfg, saga_init, saga_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg_step = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st = saga_init(F, g, x0, gamma, key, cfg_step)
    st_step = saga_run(F, g, st, cfg_step, 96)

    cfg_fused = cfg_step._replace(fused=True)
    st2 = saga_init(F, g, x0, gamma, key, cfg_fused)
    with pltpu.force_tpu_interpret_mode():
        st_fused = saga_run(F, g, st2, cfg_fused, 96)

    assert int(st_fused.it) == int(st_step.it)
    np.testing.assert_allclose(np.asarray(st_fused.z), np.asarray(st_step.z),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_fused.av), np.asarray(st_step.av),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_fused.s), np.asarray(st_step.s),
                               rtol=1e-3, atol=1e-3)


def test_saga_streamed_multistep_matches_stepwise():
    """The STREAMED-table fused kernel (any N — the VMEM slab caps the
    resident kernel at 1M rows) must reproduce the stepwise coeff path
    exactly: same stateless draw stream, launches clamped at the first
    same-launch block revisit with the masked tail redirected to a
    conflict-free window (round 3). d=64 here makes clamps frequent
    (birthday ~39 % per K=8 launch). Covers f32 + int8 rows and the
    importance-weighted stream."""
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    Np, npix, Bp = 8192, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    for F in (F32, F32.with_storage("int8")):
        for steps in (77, 96):  # non-multiple exercises the remainder
            cfg_step = SAGACfg(N=Np, sag=False, batch=Bp, block=True,
                               coeff=True)
            st_step = saga_run(F, g, saga_init(F, g, x0, gamma, key,
                                               cfg_step), cfg_step, steps)
            cfg_f = cfg_step._replace(fused_stream=True)
            st_f = saga_run(F, g, saga_init(F, g, x0, gamma, key, cfg_f),
                            cfg_f, steps)
            tag = f"{F.A.dtype} steps={steps}"
            assert int(st_f.it) == int(st_step.it) == steps + 1
            np.testing.assert_allclose(np.asarray(st_f.z),
                                       np.asarray(st_step.z),
                                       rtol=1e-4, atol=1e-6, err_msg=tag)
            # av is DELTA-accumulated: the kernel's bf16-multiply int8
            # dots round differently from the stepwise dequant path and
            # the per-step difference accumulates (z, the trajectory,
            # stays at 1e-4)
            # int8 rows: the kernel multiplies in bf16 (framework-wide
            # int8 contract) while the stepwise XLA path dequants to
            # f32 — a bf16-level gap on the c/av states (z, the
            # trajectory, stays at 1e-4 either way)
            wide = 1e-3 if F.A.dtype == jnp.float32 else 1e-2
            av_atol = (1e-4 if F.A.dtype == jnp.float32
                       else 1e-5 * float(np.abs(st_step.av).max()))
            np.testing.assert_allclose(np.asarray(st_f.av),
                                       np.asarray(st_step.av),
                                       rtol=wide, atol=av_atol, err_msg=tag)
            # atol scales with the coefficient magnitude (c = N·margin,
            # |c| ~ 1e4 here): near-zero margins compare in absolute
            # terms at the bf16 level of the LARGE entries
            c_atol = (1e-3 if F.A.dtype == jnp.float32
                      else 1e-4 * float(np.abs(st_step.s).max()))
            np.testing.assert_allclose(np.asarray(st_f.s),
                                       np.asarray(st_step.s),
                                       rtol=wide, atol=c_atol, err_msg=tag)

    # importance-weighted draws through the streamed kernel
    d = Np // Bp
    Lb = np.max(np.asarray(prob.L, np.float64).reshape(d, Bp), axis=1)
    q = Lb / Lb.sum()
    qcum = np.cumsum(q)
    qcum /= qcum[-1]
    cfg_step = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True,
                       importance=True)
    sti = saga_init(F32, g, x0, gamma, key, cfg_step)._replace(
        qcum=jnp.asarray(qcum, jnp.float32),
        qinv=jnp.asarray(1.0 / (d * q), jnp.float32),
    )
    st_step = saga_run(F32, g, sti, cfg_step, 64)
    cfg_f = cfg_step._replace(fused_stream=True)
    st_f = saga_run(F32, g, sti, cfg_f, 64)
    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_step.z),
                               rtol=1e-4, atol=1e-6)


def test_saga_fused_multistep_logistic_mode():
    """Logistic coefficient mode (MODE_LOGISTIC) through the same kernel."""
    from ciao_tpu.oracles import LogisticRows
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run
    from ciao_tpu.utils.problems import make_logistic_l1

    rng = np.random.default_rng(0)
    Np, npix, Bp = 1024, 128, 128
    X = rng.standard_normal((Np, npix)).astype(np.float32)
    y = np.sign(rng.standard_normal(Np)).astype(np.float32)
    F = LogisticRows(X=jnp.asarray(X), y=jnp.asarray(y))
    g = NormL1(lam=jnp.asarray(0.01, jnp.float32))
    gamma = jnp.asarray(0.01, jnp.float32)
    key = jax.random.PRNGKey(1)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg_step = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st_step = saga_run(F, g, saga_init(F, g, x0, gamma, key, cfg_step),
                       cfg_step, 64)
    cfg_fused = cfg_step._replace(fused=True)
    with pltpu.force_tpu_interpret_mode():
        st_fused = saga_run(F, g, saga_init(F, g, x0, gamma, key, cfg_fused),
                            cfg_fused, 64)
    np.testing.assert_allclose(np.asarray(st_fused.z), np.asarray(st_step.z),
                               rtol=1e-4, atol=1e-6)


def test_finito_fused_multistep_matches_stepwise():
    """K-steps-per-launch fused Finito kernel == stepwise coeff variant
    (same next_block_id schedule, same algebra)."""
    from ciao_tpu.solvers.finito import (
        FinitoCfg, _finito_run_fused, finito_coeff_init, finito_run,
    )

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0v = jnp.zeros(npix, jnp.float32)

    for sweeping in (2, 3):
        cfg = FinitoCfg(N=Np, batch=Bp, sweeping=sweeping, alpha=0.999)
        st = finito_coeff_init(F, g, x0v, gamma, key, cfg)
        st_step = finito_run(F, g, st, cfg, "basic_coeff", 96)

        cfg_f = cfg._replace(fused=True)
        st2 = finito_coeff_init(F, g, x0v, gamma, key, cfg_f)
        with pltpu.force_tpu_interpret_mode():
            st_fused = finito_run(F, g, st2, cfg_f, "basic_coeff", 96)

        assert int(st_fused.it) == int(st_step.it)
        np.testing.assert_allclose(np.asarray(st_fused.z), np.asarray(st_step.z),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_fused.zb), np.asarray(st_step.zb),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_fused.c), np.asarray(st_step.c),
                                   rtol=1e-3, atol=1e-3)


def test_coeff_apply_all_single_pass_anchor():
    """The one-pass anchor kernel == coeff_all + grad_sum_all."""
    from ciao_tpu.ops.fused_block import _pick_tile, coeff_apply_all

    Np, npix = 1024, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=7, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    z = jax.random.normal(jax.random.PRNGKey(3), (npix,), jnp.float32)
    tile = _pick_tile(128, Np, npix)
    scalars = jnp.asarray([[float(Np), 0.0, 0.0]], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        c1, gsum = coeff_apply_all(F.A, F.b[None, :], z[None, :], scalars, tile)
    np.testing.assert_allclose(np.asarray(c1[0]), np.asarray(F.coeff_all(z)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gsum[0]), np.asarray(F.grad_sum_all(z)),
                               rtol=1e-3, atol=1e-1)


def test_coeff_apply_all_compensated_accumulation():
    """The one-pass kernels' cross-tile sums are two-sum compensated
    (round 3, the deep-target polish mechanism applied in-kernel):
    an adversarial stream — one huge-coefficient tile followed by many
    tiny ones — must survive where a plain f32 running sum (and the
    XLA 2-pass path) drops every small tile into the big partial's
    ulp."""
    from ciao_tpu.ops.fused_block import (
        coeff_apply_all, coeff_value_apply_all,
    )

    Np, npix, TILE = 262_144, 128, 2_048
    T = Np // TILE
    A = np.zeros((Np, npix), np.float32)
    A[:, 0] = 1.0                        # gsum[0] = Σ c_i exactly
    b = np.full(Np, -1e-3, np.float32)   # c = −b = 1e-3 (LSQ, z = 0)
    b[:TILE] = -np.float32(2.0 ** 18)    # first tile: c = 2^18
    z = np.zeros(npix, np.float32)
    scalars = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    exact = float(2.0 ** 18) * TILE + 1e-3 * (Np - TILE)
    with pltpu.force_tpu_interpret_mode():
        _, gsum = coeff_apply_all(jnp.asarray(A), jnp.asarray(b)[None, :],
                                  jnp.asarray(z)[None, :], scalars, TILE)
        val, _, gsum2 = coeff_value_apply_all(
            jnp.asarray(A), jnp.asarray(b)[None, :],
            jnp.asarray(z)[None, :], scalars, TILE)
    lost = 1e-3 * (Np - TILE)            # what a plain f32 sum drops
    err = abs(float(gsum[0, 0]) - exact)
    assert err < 0.05 * lost, (err, lost)
    err2 = abs(float(gsum2[0, 0]) - exact)
    assert err2 < 0.05 * lost, (err2, lost)
    # the value sum gets the same treatment (PANOC's FBE resolution):
    # Σ ½c² = ½·2^36·TILE + ½·1e-6·(N−TILE)
    v_exact = 0.5 * (2.0 ** 36) * TILE + 0.5 * 1e-6 * (Np - TILE)
    v_lost = 0.5 * 1e-6 * (Np - TILE)
    # the huge term's own ulp (2^37·2048 has ulp ~2^25) swamps the tiny
    # tiles here no matter what; pin only that the compensated sum is
    # no WORSE than the big term's representation error
    assert abs(float(val[0, 0]) - v_exact) <= 2.0 ** 25 + v_lost


def test_svrg_fused_multistep_matches_stepwise():
    """The K-inner-steps-per-launch fused SVRG kernel (anchor coefficient
    slab + in-kernel prox + one-pass anchor refresh) must reproduce the
    stepwise block-sampled inner loop: same sampling stream, same math."""
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)
    # m=24 runs a single K=24 launch; m=70 also exercises the stepwise
    # remainder branch (K=64, Lq=1, rem=6) with its k0 offset
    for m in (24, 70):
        cfg_step = SVRGCfg(N=Np, plus=False, batch=Bp, block=True)
        st_step = svrg_run(
            F, g, svrg_init(F, g, x0, gamma, m, key, cfg_step), cfg_step, 3
        )
        cfg_fused = cfg_step._replace(fused=True, m_fused=m)
        with pltpu.force_tpu_interpret_mode():
            st_fused = svrg_run(
                F, g, svrg_init(F, g, x0, gamma, m, key, cfg_fused),
                cfg_fused, 3,
            )
        assert int(st_fused.it) == int(st_step.it)
        np.testing.assert_allclose(np.asarray(st_fused.z_full),
                                   np.asarray(st_step.z_full),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_fused.w),
                                   np.asarray(st_step.w),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_fused.av),
                                   np.asarray(st_step.av),
                                   rtol=1e-3, atol=1e-4)
        # key chains must coincide (sampling-stream parity)
        assert np.array_equal(np.asarray(st_fused.key),
                              np.asarray(st_step.key))


def test_svrg_block_minibatch_converges():
    """The batched contiguous-block inner loop (TPU fast path, beyond
    the reference's batch-1 inner loop) still solves the planted Lasso."""
    from ciao_tpu.solvers.svrg import SVRG

    Np, npix = 64, 16
    prob = make_lasso(N=Np, n=npix, p=4, seed=0)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
        scale=jnp.asarray(float(Np)),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    x, _ = SVRG(gamma=float(1.0 / (10.0 * np.max(prob.L))), maxit=400,
                batch=8, block_sampling=True)(
        jnp.zeros(npix), F=F, g=g, L=prob.L
    )
    assert float(prob.cost(x) - prob.f_star) < 1e-4


def test_fused_precision_default_plumbing():
    """fused_precision="default" (bf16-multiply MXU dots) threads through
    every fused wrapper; on CPU interpret mode the dots stay f32, so the
    trajectory matches "highest" exactly — this checks the plumbing."""
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)
    outs = {}
    for precision in ("highest", "default"):
        cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True,
                      fused=True, fused_precision=precision)
        st = saga_init(F, g, x0, gamma, key, cfg)
        with pltpu.force_tpu_interpret_mode():
            outs[precision] = saga_run(F, g, st, cfg, 32)
    np.testing.assert_array_equal(np.asarray(outs["highest"].z),
                                  np.asarray(outs["default"].z))


def test_lfinito_fused_sweep_matches_stepwise():
    """The whole-epoch fused LFinito sweep (anchor refresh + one-launch
    block sweep with in-kernel prox) must reproduce the stepwise epoch:
    same visit order, same RNG chain, same algebra."""
    from ciao_tpu.solvers.finito import FinitoCfg, finito_run, lfinito_init

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0v = jnp.zeros(npix, jnp.float32)

    for sweeping in (2, 3):
        cfg = FinitoCfg(N=Np, batch=Bp, sweeping=sweeping, alpha=0.999)
        st_step = finito_run(
            F, g, lfinito_init(F, g, x0v, gamma, key, cfg), cfg, "lfinito", 6
        )
        cfg_f = cfg._replace(fused=True)
        with pltpu.force_tpu_interpret_mode():
            st_fused = finito_run(
                F, g, lfinito_init(F, g, x0v, gamma, key, cfg_f), cfg_f,
                "lfinito", 6,
            )
        assert int(st_fused.it) == int(st_step.it)
        for fld in ("z", "z_full", "av"):
            np.testing.assert_allclose(
                np.asarray(getattr(st_fused, fld)),
                np.asarray(getattr(st_step, fld)), rtol=1e-4, atol=1e-5,
            )
        assert np.array_equal(np.asarray(st_fused.sweep.key),
                              np.asarray(st_step.sweep.key))


def test_bf16_storage_fused_tracks_f32():
    """``with_storage(bf16)``: the fused kernel streams bf16 rows
    straight to the MXU (f32 accumulate). The trajectory must track the
    f32 one to bf16 resolution (~3 digits) — measured floor on a
    planted 65k Lasso is rel ~1e-2 vs f32's ~1e-4 (PERF.md)."""
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32,
                      well_conditioned=True)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    F16 = F32.with_storage()
    assert F16.A.dtype == jnp.bfloat16 and F16.b.dtype == jnp.float32
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True,
                  fused=True)
    with pltpu.force_tpu_interpret_mode():
        st32 = saga_run(F32, g, saga_init(F32, g, x0, gamma, key, cfg),
                        cfg, 64)
        st16 = saga_run(F16, g, saga_init(F16, g, x0, gamma, key, cfg),
                        cfg, 64)
    # all-f32 state dtypes, trajectory within bf16 resolution
    assert st16.z.dtype == jnp.float32 and st16.s.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(st32.z))) + 1e-30
    err = float(jnp.max(jnp.abs(st16.z - st32.z))) / scale
    assert err < 3e-2, err
    assert err > 0.0  # bf16 really was used (identical would be a miss)


def test_bf16_storage_stepwise_xla_path():
    """The non-fused XLA paths must also accept bf16-stored rows (mixed
    bf16·f32 matmuls promote to f32)."""
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    Np, npix, Bp = 512, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=1, dtype=np.float32,
                      well_conditioned=True)
    F16 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    ).with_storage()
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st = saga_run(F16, g, saga_init(F16, g, jnp.zeros(npix, jnp.float32),
                                    gamma, jax.random.PRNGKey(0), cfg),
                  cfg, 32)
    assert st.z.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(st.z)))


def test_make_lasso_well_conditioned_kkt():
    """The capped variant still plants an exact optimum (KKT: the dual
    certificate y* = b − A x* satisfies |A_j^T y*| ≤ λ everywhere, = λ
    with matching sign on the support) and bounds the column spread."""
    prob = make_lasso(N=256, n=64, p=8, seed=0, dtype=np.float64,
                      well_conditioned=True)
    y_star = prob.b - prob.A @ prob.x_star
    corr = prob.A.T @ y_star
    sup = prob.x_star != 0
    assert sup.sum() == 8
    np.testing.assert_allclose(corr[sup], prob.lam * np.sign(prob.x_star[sup]),
                               rtol=1e-10)
    assert np.all(np.abs(corr[~sup]) <= prob.lam * (1 + 1e-12))
    norms = np.linalg.norm(prob.A, axis=0)
    assert norms.max() / norms.min() < 3.0


def test_bf16_storage_other_fused_kernels():
    """Finito-multistep, SVRG-multistep and the LFinito sweep all stream
    bf16 rows through the same ``_stream_dot`` helper — each must track
    its f32 trajectory to bf16 resolution with all-f32 state."""
    from ciao_tpu.solvers.finito import (
        FinitoCfg, finito_coeff_init, finito_run, lfinito_init,
    )
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32,
                      well_conditioned=True)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    F16 = F32.with_storage()
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    def rel_err(a, b):
        s = float(jnp.max(jnp.abs(b))) + 1e-30
        return float(jnp.max(jnp.abs(a - b))) / s

    cfg = FinitoCfg(N=Np, batch=Bp, sweeping=3, alpha=0.999, fused=True)
    with pltpu.force_tpu_interpret_mode():
        z32 = finito_run(F32, g, finito_coeff_init(F32, g, x0, gamma, key, cfg),
                         cfg, "basic_coeff", 48).z
        z16 = finito_run(F16, g, finito_coeff_init(F16, g, x0, gamma, key, cfg),
                         cfg, "basic_coeff", 48).z
    assert z16.dtype == jnp.float32 and 0.0 < rel_err(z16, z32) < 3e-2

    with pltpu.force_tpu_interpret_mode():
        z32 = finito_run(F32, g, lfinito_init(F32, g, x0, gamma, key, cfg),
                         cfg, "lfinito", 4).z
        z16 = finito_run(F16, g, lfinito_init(F16, g, x0, gamma, key, cfg),
                         cfg, "lfinito", 4).z
    assert z16.dtype == jnp.float32 and 0.0 < rel_err(z16, z32) < 3e-2

    gam_s = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    scfg = SVRGCfg(N=Np, plus=False, batch=Bp, block=True, fused=True,
                   m_fused=24)
    with pltpu.force_tpu_interpret_mode():
        z32 = svrg_run(F32, g, svrg_init(F32, g, x0, gam_s, 24, key, scfg),
                       scfg, 2).z_full
        z16 = svrg_run(F16, g, svrg_init(F16, g, x0, gam_s, 24, key, scfg),
                       scfg, 2).z_full
    assert z16.dtype == jnp.float32 and 0.0 < rel_err(z16, z32) < 3e-2


def test_int8_storage_oracle_consistency():
    """``with_storage(int8)``: every oracle path computes EXACTLY with
    the perturbed operator Ã = diag(row_scale)·Q — the quantized paths
    must agree with a dense reference built from Ã, and Ã must be
    within the absmax-quantization error of A."""
    rng = np.random.default_rng(0)
    Np, npix = 64, 32
    A = rng.standard_normal((Np, npix)).astype(np.float32)
    b = rng.standard_normal(Np).astype(np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(A), b=jnp.asarray(b),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    Fq = F.with_storage("int8")
    assert Fq.A.dtype == jnp.int8 and Fq.row_scale.shape == (Np,)
    At = np.asarray(Fq.A, np.float32) * np.asarray(Fq.row_scale)[:, None]
    # quantization error ≤ rs/2 per element
    assert np.max(np.abs(At - A) / np.asarray(Fq.row_scale)[:, None]) <= 0.5
    Fd = LeastSquaresRows(A=jnp.asarray(At), b=jnp.asarray(b),
                          scale=jnp.asarray(float(Np), jnp.float32))
    x = jnp.asarray(rng.standard_normal(npix).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(Np).astype(np.float32))
    idx = jnp.asarray([3, 17, 41], jnp.int32)
    tol = dict(rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(Fq.grad_sum_all(x), Fd.grad_sum_all(x), **tol)
    np.testing.assert_allclose(Fq.grad_all(x), Fd.grad_all(x), **tol)
    np.testing.assert_allclose(Fq.coeff_all(x), Fd.coeff_all(x), **tol)
    np.testing.assert_allclose(Fq.apply_all(w), Fd.apply_all(w), **tol)
    np.testing.assert_allclose(Fq.coeff_block(x, 8, 16),
                               Fd.coeff_block(x, 8, 16), **tol)
    np.testing.assert_allclose(Fq.apply_rows_block(w[8:24], 8, 16),
                               Fd.apply_rows_block(w[8:24], 8, 16), **tol)
    np.testing.assert_allclose(Fq.grad_block(x, 8, 16),
                               Fd.grad_block(x, 8, 16), **tol)
    np.testing.assert_allclose(Fq.grad_sum_diff_block(x, 0.5 * x, 8, 16),
                               Fd.grad_sum_diff_block(x, 0.5 * x, 8, 16),
                               **tol)
    np.testing.assert_allclose(Fq.grad_sum_batch(x, idx),
                               Fd.grad_sum_batch(x, idx), **tol)
    np.testing.assert_allclose(Fq.value_and_grad_i(x, 3)[1],
                               Fd.value_and_grad_i(x, 3)[1], **tol)
    # TP margin split: scale applied AFTER the (possibly psum'd) margin
    np.testing.assert_allclose(
        Fq.coeff_from_margin_all(Fq.margin_all(x)), Fd.coeff_all(x), **tol)

    # logistic family, same contract
    y = jnp.asarray(np.sign(rng.standard_normal(Np)).astype(np.float32))
    from ciao_tpu.oracles import LogisticRows

    Lq = LogisticRows(X=jnp.asarray(A), y=y).with_storage(jnp.int8)
    Ld = LogisticRows(X=jnp.asarray(
        np.asarray(Lq.X, np.float32) * np.asarray(Lq.row_scale)[:, None]
    ), y=y)
    np.testing.assert_allclose(Lq.grad_sum_all(x), Ld.grad_sum_all(x), **tol)
    np.testing.assert_allclose(Lq.coeff_all(x), Ld.coeff_all(x), **tol)
    np.testing.assert_allclose(
        Lq.coeff_from_margin_all(Lq.margin_all(x)), Ld.coeff_all(x), **tol)


def test_int8_storage_fused_tracks_f32():
    """``with_storage(int8)``: the fused SAGA kernel streams int8 rows
    (cast to bf16 in VMEM — exact) with the per-row dequant scales
    applied to the (1, TILE) margin/innovation vectors. The trajectory
    must track f32 to int8 resolution (~2.3 digits)."""
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32,
                      well_conditioned=True)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    Fq = F32.with_storage("int8")
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True,
                  fused=True)
    with pltpu.force_tpu_interpret_mode():
        st32 = saga_run(F32, g, saga_init(F32, g, x0, gamma, key, cfg),
                        cfg, 64)
        stq = saga_run(Fq, g, saga_init(Fq, g, x0, gamma, key, cfg),
                       cfg, 64)
    assert stq.z.dtype == jnp.float32 and stq.s.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(st32.z))) + 1e-30
    err = float(jnp.max(jnp.abs(stq.z - st32.z))) / scale
    assert 0.0 < err < 1e-1, err

    # fused int8 must match the stepwise XLA path on the SAME quantized
    # oracle to the kernel's bf16-margin resolution (identical operator)
    cfg_x = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st_xla = saga_run(Fq, g, saga_init(Fq, g, x0, gamma, key, cfg_x),
                      cfg_x, 64)
    err2 = float(jnp.max(jnp.abs(stq.z - st_xla.z))) / scale
    assert err2 < 1e-2, err2


def test_int8_storage_other_fused_kernels():
    """Finito-multistep, SVRG-multistep and the LFinito sweep with int8
    rows + dequant scales — each must track its f32 trajectory."""
    from ciao_tpu.solvers.finito import (
        FinitoCfg, finito_coeff_init, finito_run, lfinito_init,
    )
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32,
                      well_conditioned=True)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    Fq = F32.with_storage("int8")
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)

    def rel_err(a, b):
        s = float(jnp.max(jnp.abs(b))) + 1e-30
        return float(jnp.max(jnp.abs(a - b))) / s

    cfg = FinitoCfg(N=Np, batch=Bp, sweeping=3, alpha=0.999, fused=True)
    with pltpu.force_tpu_interpret_mode():
        z32 = finito_run(F32, g, finito_coeff_init(F32, g, x0, gamma, key, cfg),
                         cfg, "basic_coeff", 48).z
        zq = finito_run(Fq, g, finito_coeff_init(Fq, g, x0, gamma, key, cfg),
                        cfg, "basic_coeff", 48).z
    assert zq.dtype == jnp.float32 and 0.0 < rel_err(zq, z32) < 1e-1

    with pltpu.force_tpu_interpret_mode():
        z32 = finito_run(F32, g, lfinito_init(F32, g, x0, gamma, key, cfg),
                         cfg, "lfinito", 4).z
        zq = finito_run(Fq, g, lfinito_init(Fq, g, x0, gamma, key, cfg),
                        cfg, "lfinito", 4).z
    assert zq.dtype == jnp.float32 and 0.0 < rel_err(zq, z32) < 1e-1

    gam_s = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    scfg = SVRGCfg(N=Np, plus=False, batch=Bp, block=True, fused=True,
                   m_fused=24)
    with pltpu.force_tpu_interpret_mode():
        z32 = svrg_run(F32, g, svrg_init(F32, g, x0, gam_s, 24, key, scfg),
                       scfg, 2).z_full
        zq = svrg_run(Fq, g, svrg_init(Fq, g, x0, gam_s, 24, key, scfg),
                      scfg, 2).z_full
    assert zq.dtype == jnp.float32 and 0.0 < rel_err(zq, z32) < 1e-1


def test_saga_rebase_storage_switch():
    """Staged-precision schedules swap the oracle's row storage mid-run.
    The delta-maintained running average then still carries the OLD
    operator's bias (av was accumulated as Σ c_i·ã_i/N with the previous
    rows), which never decays — the run stalls near the quantization
    error. ``saga_rebase`` recomputes av from the coefficient table
    under the new rows (one pass) and restores convergence to the new
    storage's floor."""
    from ciao_tpu.solvers.saga import (
        SAGACfg, saga_init, saga_rebase, saga_run,
    )

    Np, npix, Bp = 2048, 128, 256
    prob = make_lasso(N=Np, n=npix, p=8, seed=0, dtype=np.float32,
                      well_conditioned=True)
    Fp = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    Fq = Fp.with_storage("int8")
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gam = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    key = jax.random.PRNGKey(0)
    fs = abs(prob.f_star)

    def rel(z):
        return (prob.cost(np.asarray(z)) - prob.f_star) / fs

    st = saga_init(Fp, g, jnp.zeros(npix, jnp.float32), gam, key, cfg)
    st = saga_run(Fq, g, st, cfg, 8000)           # int8 coarse stage

    st_rb = saga_rebase(Fp, st, cfg)
    # algebraic contract: av consistent with the table under f32 rows
    np.testing.assert_allclose(
        np.asarray(st_rb.av), np.asarray(Fp.apply_all(st.s) / Np),
        rtol=1e-6, atol=1e-8,
    )
    # measured on this problem: the un-rebased finish stalls ~5.9e-5
    # while the rebased one reaches ~8.7e-7 (the f32 floor)
    r_nr = rel(saga_run(Fp, g, st, cfg, 30000).z)
    r_rb = rel(saga_run(Fp, g, st_rb, cfg, 30000).z)
    assert r_rb < 5e-6, r_rb
    assert r_nr > 1e-5, r_nr
    # full-table mode is storage-consistent already: rebase is identity
    cfg_t = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=False)
    st_t = saga_init(Fp, g, jnp.zeros(npix, jnp.float32), gam, key, cfg_t)
    st_t2 = saga_rebase(Fp, st_t, cfg_t)
    np.testing.assert_array_equal(np.asarray(st_t2.av), np.asarray(st_t.av))


def test_finito_rebase_storage_switch():
    """Finito coefficient mode has the same delta-maintained ``av`` as
    SAGA (``test_saga_rebase_storage_switch``): after an int8→f32
    storage swap, ``finito_rebase`` must restore the exact identity
    av = hat_γ·(Σ_j invg_j·zb_j − apply_all(c)/N) under the new rows
    (and re-prox z); the rebased finish must out-converge the stalled
    un-rebased one."""
    from ciao_tpu.solvers.finito import (
        FinitoCfg, finito_coeff_init, finito_rebase, finito_run,
    )

    Np, npix, Bp = 2048, 128, 256
    prob = make_lasso(N=Np, n=npix, p=8, seed=0, dtype=np.float32,
                      well_conditioned=True)
    Fp = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    Fq = Fp.with_storage("int8")
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    cfg = FinitoCfg(N=Np, batch=Bp, sweeping=3, alpha=0.999)
    key = jax.random.PRNGKey(0)
    fs = abs(prob.f_star)

    def rel(z):
        return (prob.cost(np.asarray(z)) - prob.f_star) / fs

    st = finito_coeff_init(Fp, g, jnp.zeros(npix, jnp.float32), gamma, key, cfg)
    st = finito_run(Fq, g, st, cfg, "basic_coeff", 4000)  # int8 stage

    st_rb = finito_rebase(Fp, g, st, cfg)
    hat = np.asarray(st.hat_gamma)
    av_ref = hat * (np.asarray(st.invg) @ np.asarray(st.zb)) - (
        hat / Np
    ) * np.asarray(Fp.apply_all(st.c))
    np.testing.assert_allclose(np.asarray(st_rb.av), av_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_rb.z),
        np.asarray(g.prox_only(jnp.asarray(av_ref), st.hat_gamma)),
        rtol=1e-5, atol=1e-7,
    )

    # measured: un-rebased floors at ~8.1e-5, rebased reaches the f32
    # floor ~1.8e-5 on this problem
    r_nr = rel(finito_run(Fp, g, st, cfg, "basic_coeff", 12000).z)
    r_rb = rel(finito_run(Fp, g, st_rb, cfg, "basic_coeff", 12000).z)
    assert r_rb < 3e-5, r_rb
    assert r_nr > 5e-5, r_nr


def test_beyond_reference_fused_logistic_mode():
    """MODE_LOGISTIC through the round-2 fused kernels: the Katyusha,
    SARAH, and coin-aware L-SVRG multi-step kernels evaluate the
    logistic coefficient c = −y·σ(−y·m) in-kernel and must reproduce
    their stepwise paths on a logistic problem (the LSQ equality suites
    live in each family's test file)."""
    from ciao_tpu.oracles import LogisticRows
    from ciao_tpu.solvers.katyusha import (
        KatyushaCfg, katyusha_init, katyusha_run,
    )
    from ciao_tpu.solvers.lsvrg import LSVRGCfg, lsvrg_init, lsvrg_run
    from ciao_tpu.solvers.sarah import SARAHCfg, sarah_init, sarah_run

    rng = np.random.default_rng(0)
    Np, npix, Bp = 1024, 128, 128
    X = rng.standard_normal((Np, npix)).astype(np.float32)
    y = np.sign(rng.standard_normal(Np)).astype(np.float32)
    F = LogisticRows(X=jnp.asarray(X), y=jnp.asarray(y))
    g = NormL1(lam=jnp.asarray(0.01, jnp.float32))
    key = jax.random.PRNGKey(1)
    x0v = jnp.zeros(npix, jnp.float32)
    Lm = jnp.asarray(0.25 * float(np.max(np.sum(X * X, axis=1))), jnp.float32)

    kcfg = KatyushaCfg(N=Np, batch=Bp, m=16, block=True, ns=True)
    half = jnp.asarray(0.5, jnp.float32)
    st_s = katyusha_run(
        F, g, katyusha_init(F, g, x0v, Lm, half, half, key, kcfg), kcfg, 2)
    with pltpu.force_tpu_interpret_mode():
        st_f = katyusha_run(
            F, g,
            katyusha_init(F, g, x0v, Lm, half, half, key,
                          kcfg._replace(fused=True)),
            kcfg._replace(fused=True), 2)
    np.testing.assert_allclose(np.asarray(st_f.x_tilde),
                               np.asarray(st_s.x_tilde),
                               rtol=1e-4, atol=1e-6)

    scfg = SARAHCfg(N=Np, batch=Bp, m=16, block=True)
    gam = jnp.asarray(0.05, jnp.float32)
    one = jnp.asarray(1.0, jnp.float32)
    st_s = sarah_run(F, g, sarah_init(F, g, x0v, gam, one, key, scfg),
                     scfg, 2)
    with pltpu.force_tpu_interpret_mode():
        st_f = sarah_run(
            F, g,
            sarah_init(F, g, x0v, gam, one, key, scfg._replace(fused=True)),
            scfg._replace(fused=True), 2)
    np.testing.assert_allclose(np.asarray(st_f.x_tilde),
                               np.asarray(st_s.x_tilde),
                               rtol=1e-4, atol=1e-6)

    lcfg = LSVRGCfg(N=Np, batch=Bp, block=True)
    pj = jnp.asarray(0.1, jnp.float32)
    st_s = lsvrg_run(F, g, lsvrg_init(F, g, x0v, gam, pj, key, lcfg),
                     lcfg, 40)
    with pltpu.force_tpu_interpret_mode():
        st_f = lsvrg_run(
            F, g,
            lsvrg_init(F, g, x0v, gam, pj, key, lcfg._replace(fused=True)),
            lcfg._replace(fused=True), 40)
    np.testing.assert_allclose(np.asarray(st_f.w), np.asarray(st_s.w),
                               rtol=1e-4, atol=1e-6)


def test_huber_fused_mode_matches_stepwise():
    """MODE_HUBER through the fused kernels (round 2: δ rides the
    trailing ``aux`` scalar slot): HuberRows now serves the same fused
    paths as LeastSquaresRows, and the trajectories must equal the
    stepwise XLA coefficient paths — pinned here through SAGA (VMEM
    slab), SVRG (streamed anchor + inner loop), and ProShI (streamed
    table, robust sharing blocks)."""
    from ciao_tpu.oracles import HuberRows
    from ciao_tpu.prox import IndBox, Zero as _Zero
    from ciao_tpu.solvers.proshi import ProshiCfg, proshi_init, proshi_run
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = HuberRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        delta=jnp.asarray(0.02, jnp.float32),   # bites: residuals clip
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    assert F.coeff_mode == 2
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0v = jnp.zeros(npix, jnp.float32)

    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st_s = saga_run(F, g, saga_init(F, g, x0v, gamma, key, cfg), cfg, 64)
    with pltpu.force_tpu_interpret_mode():
        st_f = saga_run(F, g, saga_init(F, g, x0v, gamma, key,
                                        cfg._replace(fused=True)),
                        cfg._replace(fused=True), 64)
    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_s.z),
                               rtol=1e-4, atol=1e-6)
    # the clip must actually be active, else this tests nothing beyond LSQ
    c = np.asarray(F.coeff_all(st_s.z))
    assert np.any(np.isclose(np.abs(c), float(Np) * 0.02, rtol=1e-5))

    # int8-stored Huber rows: both paths compute on the SAME quantized
    # operator; δ clips the dequantized margins identically
    F8 = F.with_storage("int8")
    st_s8 = saga_run(F8, g, saga_init(F8, g, x0v, gamma, key, cfg),
                     cfg, 64)
    with pltpu.force_tpu_interpret_mode():
        st_f8 = saga_run(F8, g, saga_init(F8, g, x0v, gamma, key,
                                          cfg._replace(fused=True)),
                         cfg._replace(fused=True), 64)
    np.testing.assert_allclose(np.asarray(st_f8.z), np.asarray(st_s8.z),
                               rtol=1e-4, atol=1e-6)

    scfg = SVRGCfg(N=Np, plus=False, batch=Bp, block=True)
    gam_s = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    st_s = svrg_run(F, g, svrg_init(F, g, x0v, gam_s, 24, key, scfg),
                    scfg, 3)
    scfg_f = scfg._replace(fused=True, m_fused=24)
    with pltpu.force_tpu_interpret_mode():
        st_f = svrg_run(F, g, svrg_init(F, g, x0v, gam_s, 24, key, scfg_f),
                        scfg_f, 3)
    np.testing.assert_allclose(np.asarray(st_f.z_full),
                               np.asarray(st_s.z_full),
                               rtol=1e-4, atol=1e-6)

    gamma_p = jnp.asarray(0.999 * Np / np.asarray(prob.L, np.float32),
                          jnp.float32)
    pcfg = ProshiCfg(N=Np, batch=Bp, sweeping=2, alpha=0.999)
    gp = IndBox(lo=-jnp.inf, hi=jnp.asarray(0.5, jnp.float32))
    st_s = proshi_run(F, gp, proshi_init(F, gp, x0v, gamma_p, key, pcfg),
                      pcfg, 24)
    pcfg_f = pcfg._replace(fused=True)
    with pltpu.force_tpu_interpret_mode():
        st_f = proshi_run(F, gp,
                          proshi_init(F, gp, x0v, gamma_p, key, pcfg_f),
                          pcfg_f, 24)
    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_s.z),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_f.s), np.asarray(st_s.s),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("Np,npix,Bp", [
    (2048, 256, 256),    # TILE == B (single tile per block)
    (4096, 128, 512),    # ncols = 512, B == ncols (full slab row/block)
    (1024, 384, 64),     # non-power-of-two n (3×128 lanes), small blocks
])
def test_fused_kernels_shape_fuzz(Np, npix, Bp):
    """Shape fuzz over the fused kernels' slab/tile index arithmetic
    (row = start // ncols, off = start % ncols, TILE | B, B | ncols):
    the fixed-shape equality suites all use N=1024, n=128, B=128 — these
    combos hit single-tile blocks, block == slab-row, and non-pow2 lane
    counts. Each kernel family must still reproduce its stepwise path."""
    from ciao_tpu.solvers.katyusha import (
        KatyushaCfg, katyusha_init, katyusha_run,
    )
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    # (availability gates include backend == "tpu", so cfg.fused is set
    # directly here like the other CPU equality suites; the shapes all
    # satisfy the slab/tile divisibility contracts)
    prob = make_lasso(N=Np, n=npix, p=4, seed=Np % 97, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(Np)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg = SAGACfg(N=Np, sag=False, batch=Bp, block=True, coeff=True)
    st_s = saga_run(F, g, saga_init(F, g, x0, gamma, key, cfg), cfg, 40)
    with pltpu.force_tpu_interpret_mode():
        st_f = saga_run(F, g, saga_init(F, g, x0, gamma, key,
                                        cfg._replace(fused=True)),
                        cfg._replace(fused=True), 40)
    np.testing.assert_allclose(np.asarray(st_f.z), np.asarray(st_s.z),
                               rtol=1e-4, atol=1e-6)

    m = max(2, Np // Bp // 2)
    scfg = SVRGCfg(N=Np, plus=False, batch=Bp, block=True)
    gam_s = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    st_s = svrg_run(F, g, svrg_init(F, g, x0, gam_s, m, key, scfg),
                    scfg, 2)
    scfg_f = scfg._replace(fused=True, m_fused=m)
    with pltpu.force_tpu_interpret_mode():
        st_f = svrg_run(F, g, svrg_init(F, g, x0, gam_s, m, key, scfg_f),
                        scfg_f, 2)
    np.testing.assert_allclose(np.asarray(st_f.z_full),
                               np.asarray(st_s.z_full),
                               rtol=1e-4, atol=1e-6)

    kcfg = KatyushaCfg(N=Np, batch=Bp, m=m, block=True, ns=True)
    Lm = jnp.asarray(np.max(prob.L), jnp.float32)
    half = jnp.asarray(0.5, jnp.float32)
    st_s = katyusha_run(
        F, g, katyusha_init(F, g, x0, Lm, half, half, key, kcfg), kcfg, 2)
    with pltpu.force_tpu_interpret_mode():
        st_f = katyusha_run(
            F, g,
            katyusha_init(F, g, x0, Lm, half, half, key,
                          kcfg._replace(fused=True)),
            kcfg._replace(fused=True), 2)
    np.testing.assert_allclose(np.asarray(st_f.x_tilde),
                               np.asarray(st_s.x_tilde),
                               rtol=1e-4, atol=1e-6)


def test_finito_streamed_multistep_matches_stepwise():
    """The STREAMED-table fused Finito-coeff kernel (any N — beyond the
    VMEM slab cap; round 3): c streams through clamped aliased windows,
    the (d, n) anchor table stays VMEM-resident, and the per-block Σ1/γ
    weights ride a second scalar-prefetch operand. Must reproduce the
    stepwise path exactly — cyclic (no clamp) and shuffled
    (epoch-boundary clamps) sweeps, f32 + int8."""
    from ciao_tpu.solvers.finito import (
        FinitoCfg, finito_coeff_init, finito_run,
    )

    Np, npix, Bp = 8192, 128, 128   # d = 64
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = 0.999 * Np / jnp.asarray(prob.L, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0v = jnp.zeros(npix, jnp.float32)
    for F in (F32, F32.with_storage("int8")):
        for sweeping in (2, 3):
            for steps in (77, 96):
                cfg_sw = FinitoCfg(N=Np, batch=Bp, sweeping=sweeping,
                                   alpha=0.999)
                st_sw = finito_run(
                    F, g, finito_coeff_init(F, g, x0v, gamma, key, cfg_sw),
                    cfg_sw, "basic_coeff", steps)
                cfg_f = cfg_sw._replace(fused_stream=True)
                st_f = finito_run(
                    F, g, finito_coeff_init(F, g, x0v, gamma, key, cfg_f),
                    cfg_f, "basic_coeff", steps)
                rows_dt = F.A.dtype
                tag = f"{rows_dt} sweep={sweeping} steps={steps}"
                assert int(st_f.it) == int(st_sw.it) == steps + 1
                assert int(st_f.sweep.pos) == int(st_sw.sweep.pos), tag
                wide = 1e-4 if rows_dt == jnp.float32 else 1e-2
                np.testing.assert_allclose(np.asarray(st_f.z),
                                           np.asarray(st_sw.z),
                                           rtol=wide, atol=1e-6,
                                           err_msg=tag)
                np.testing.assert_allclose(np.asarray(st_f.zb),
                                           np.asarray(st_sw.zb),
                                           rtol=wide, atol=1e-6,
                                           err_msg=tag)
                av_atol = (1e-4 if rows_dt == jnp.float32
                           else 1e-5 * float(np.abs(st_sw.av).max()))
                np.testing.assert_allclose(np.asarray(st_f.av),
                                           np.asarray(st_sw.av),
                                           rtol=max(wide, 1e-3),
                                           atol=av_atol, err_msg=tag)


def test_svrg_plus_fused_dynamic_m_matches_stepwise():
    """Single-chip SVRG++ on the fused path (round 4): the doubling m
    runs a dynamic number of K=64-step launches + a dynamic remainder
    (_svrg_step_fused_plus) and must track the stepwise block path
    across outers whose m crosses the launch boundary (48→96→192),
    doubling m in sync."""
    from jax.experimental.pallas import tpu as pltpu

    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    Np, npix, Bp = 8192, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=5, dtype=np.float32,
                      well_conditioned=True)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32), b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (10.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(3)
    x0 = jnp.zeros(npix, jnp.float32)

    cfg_sw = SVRGCfg(N=Np, plus=True, batch=Bp, block=True)
    st_sw = svrg_run(F, g, svrg_init(F, g, x0, gamma, 48, key, cfg_sw),
                     cfg_sw, 3)
    cfg_f = cfg_sw._replace(fused=True)
    with pltpu.force_tpu_interpret_mode():
        st_f = svrg_run(F, g, svrg_init(F, g, x0, gamma, 48, key, cfg_f),
                        cfg_f, 3)
    assert int(st_f.m) == int(st_sw.m) == 48 * 8
    np.testing.assert_allclose(np.asarray(st_f.z_full),
                               np.asarray(st_sw.z_full),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_f.w), np.asarray(st_sw.w),
                               rtol=2e-5, atol=1e-6)
