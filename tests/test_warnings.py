"""Fused-fallback warnings (VERDICT r3 weak #1): when a TPU-backend
run lands on the stepwise XLA path for a user-fixable reason, the
facade says so ONCE, naming reason + remedy; silent on CPU and silent
when the fused path is taken. ``runtime.on_tpu`` is monkeypatched so
the TPU-only gating logic runs on the CI CPU mesh."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu import (
    Finito,
    IndBox,
    LeastSquaresRows,
    NormL1,
    SAGA,
    SVRG,
    runtime,
)

N, n = 8_192, 128  # slab-fused-eligible shapes (d = 64 blocks)


@pytest.fixture()
def fake_tpu(monkeypatch):
    monkeypatch.setattr(runtime, "on_tpu", lambda: True)
    runtime.reset_fallback_warnings()
    yield
    runtime.reset_fallback_warnings()


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((N, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32))
    L = np.asarray(jnp.sum(A * A, axis=1) * N)
    return F, L


def _setup(solver, F, g, L, x0):
    return solver._setup(x0, F, g, L, None)


def test_saga_warns_on_unsupported_prox(fake_tpu, prob):
    F, L = prob
    with pytest.warns(UserWarning, match="NormL1/Zero"):
        _setup(SAGA(block_sampling=True, batch=128), F,
               IndBox(lo=-1.0, hi=1.0), L, jnp.zeros(n, jnp.float32))


def test_saga_warns_on_f64_iterate(fake_tpu, prob):
    F, L = prob
    with pytest.warns(UserWarning, match="f32-only"):
        _setup(SAGA(block_sampling=True, batch=128), F, None, L,
               jnp.zeros(n, jnp.float64))


def test_saga_warns_on_shape_gate(fake_tpu, prob):
    F, L = prob
    # n = 100 is not lane-aligned → shape-gate message with the remedy
    F100 = LeastSquaresRows(A=F.A[:, :100], b=F.b,
                            scale=jnp.asarray(float(N), jnp.float32))
    with pytest.warns(UserWarning, match="128 lanes"):
        _setup(SAGA(block_sampling=True, batch=128), F100, None,
               L, jnp.zeros(100, jnp.float32))


def test_saga_silent_when_fused(fake_tpu, prob):
    F, L = prob
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, _, _, cfg, _ = _setup(
            SAGA(block_sampling=True, batch=128), F,
            NormL1(lam=jnp.asarray(0.1, jnp.float32)), L,
            jnp.zeros(n, jnp.float32))
    assert cfg.fused or cfg.fused_stream


def test_saga_silent_off_tpu(prob):
    runtime.reset_fallback_warnings()
    F, L = prob
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _setup(SAGA(block_sampling=True, batch=128), F,
               IndBox(lo=-1.0, hi=1.0), L, jnp.zeros(n, jnp.float32))


def test_saga_warns_once_per_reason(fake_tpu, prob):
    F, L = prob
    g = IndBox(lo=-1.0, hi=1.0)
    with pytest.warns(UserWarning):
        _setup(SAGA(block_sampling=True, batch=128), F, g, L,
               jnp.zeros(n, jnp.float32))
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # second setup: deduped
        _setup(SAGA(block_sampling=True, batch=128), F, g, L,
               jnp.zeros(n, jnp.float32))


def test_saga_complex_is_exempt(fake_tpu):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((256, n))
                    + 1j * rng.standard_normal((256, n)), jnp.complex64)
    b = jnp.asarray(rng.standard_normal(256), jnp.complex64)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(256.0, jnp.float32))
    L = np.asarray(jnp.sum(jnp.abs(A) ** 2, axis=1).real * 256)
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # complex: no fused kernel by design
        _setup(SAGA(block_sampling=True, batch=64), F, None, L,
               jnp.zeros(n, jnp.complex64))


def test_finito_warns_and_silent(fake_tpu, prob):
    F, L = prob
    with pytest.warns(UserWarning, match="NormL1/Zero"):
        _setup(Finito(minibatch=(True, 128), sweeping=3), F,
               IndBox(lo=-1.0, hi=1.0), L, jnp.zeros(n, jnp.float32))
    runtime.reset_fallback_warnings()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, _, _, cfg, _, variant = _setup(
            Finito(minibatch=(True, 128), sweeping=3), F,
            NormL1(lam=jnp.asarray(0.1, jnp.float32)), L,
            jnp.zeros(n, jnp.float32))
    assert variant == "basic_coeff" and (cfg.fused or cfg.fused_stream)


def test_lfinito_warns_on_unsupported_prox(fake_tpu, prob):
    F, L = prob
    with pytest.warns(UserWarning, match="NormL1/Zero"):
        _setup(Finito(LFinito=True, minibatch=(True, 128), sweeping=3),
               F, IndBox(lo=-1.0, hi=1.0), L, jnp.zeros(n, jnp.float32))


def test_svrg_warns_and_batch1_hint(fake_tpu, prob):
    F, L = prob
    with pytest.warns(UserWarning, match="NormL1/Zero"):
        SVRG(block_sampling=True, batch=128, m=64)._setup(
            jnp.zeros(n, jnp.float32), F, IndBox(lo=-1.0, hi=1.0),
            L, np.ones(N), None)
    runtime.reset_fallback_warnings()
    with pytest.warns(UserWarning, match="batch"):
        SVRG(block_sampling=True, batch=1, m=64)._setup(
            jnp.zeros(n, jnp.float32), F,
            NormL1(lam=jnp.asarray(0.1, jnp.float32)), L, np.ones(N),
            None)


def test_saga_sparse_layout_warnings(fake_tpu):
    """Sparse oracles: pure ELL warns with the hybrid remedy; the
    hybrid layout (already the sparse fast path) stays silent."""
    from ciao_tpu.utils.problems import make_sparse_lasso_ell

    prob = make_sparse_lasso_ell(N=512, n=512, hot=128, k_hot=8,
                                 k_cold=4, p=16, seed=0)
    L = np.asarray(prob.L)
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    with pytest.warns(UserWarning, match="Hybrid"):
        _setup(SAGA(block_sampling=True, batch=64), prob.ell, g, L,
               jnp.zeros(512, jnp.float32))
    runtime.reset_fallback_warnings()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _setup(SAGA(block_sampling=True, batch=64), prob.hybrid, g, L,
               jnp.zeros(512, jnp.float32))


def test_beyond_reference_facades_warn(fake_tpu, prob):
    """Katyusha/SARAH/LSVRG/LKatyusha (shared fused_inner_gate) and
    PointSAGA/SSNM/Proshi warn once with reason + remedy when a
    block-sampling config closes their fused gate; silent when open."""
    from ciao_tpu import (
        Katyusha, LKatyusha, LSVRG, PointSAGA, Proshi, SARAH, SSNM,
    )

    F, L = prob
    bad_g = IndBox(lo=-1.0, hi=1.0)
    good_g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    x0 = jnp.zeros(n, jnp.float32)
    setups = [
        ("Katyusha", lambda g: Katyusha(
            maxit=1, batch=128, m=8, block_sampling=True)._setup(
                x0, F, g, L, None)),
        ("SARAH", lambda g: SARAH(
            maxit=1, batch=128, m=8, block_sampling=True)._setup(
                x0, F, g, L, None)),
        ("LSVRG", lambda g: LSVRG(
            maxit=1, batch=128, block_sampling=True)._setup(
                x0, F, g, L, None)),
        ("SSNM", lambda g: SSNM(maxit=1, batch=128)._setup(
            x0, F, g, L, None)),
    ]
    for who, fn in setups:
        runtime.reset_fallback_warnings()
        with pytest.warns(UserWarning, match="NormL1/Zero"):
            fn(bad_g)
        runtime.reset_fallback_warnings()
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            fn(good_g)

    # PointSAGA: g-independent kernel; close the gate via dtype
    runtime.reset_fallback_warnings()
    with pytest.warns(UserWarning, match="f32-only"):
        PointSAGA(maxit=1, batch=128, block_sampling=True)._setup(
            jnp.zeros(n, jnp.float64), F, None, L, None)

    # Proshi: RANDOM sweep without block_sampling names the remedy
    runtime.reset_fallback_warnings()
    with pytest.warns(UserWarning, match="block_sampling"):
        Proshi(maxit=1, minibatch=(True, 128), sweeping=1)._setup(
            x0, F, bad_g, L, None)


def test_deep_solve_sharing_expected_fallback_is_silent(fake_tpu):
    """deep_solve_sharing's ProShI leg is stepwise BY DESIGN ((N, n)
    quadratic blocks are not rank-1): the public API must not warn —
    and the suppression must NOT consume the one-time dedup slot, so a
    user's own later stepwise config with the same reason still does
    (runtime.expected_fallback)."""
    from ciao_tpu import DiagQuadratic, deep_solve_sharing
    from ciao_tpu.utils import make_sharing_planted

    prob = make_sharing_planted(N=64, n=16, p=4, seed=0)
    F = DiagQuadratic(d=jnp.asarray(prob.d, jnp.float32),
                      q=jnp.asarray(prob.q, jnp.float32))
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        blocks, info = deep_solve_sharing(
            jnp.zeros(16, jnp.float32), F, g=g, L=prob.L, N=64,
            batch=8, chunk_epochs=8, max_epochs=64, resync_chunk=16)
    rel = (prob.cost(np.asarray(blocks)) - prob.f_star) / abs(prob.f_star)
    assert rel < 1e-5

    # the same stepwise reason still warns when the USER hits it
    from ciao_tpu import Proshi

    with pytest.warns(UserWarning, match="stepwise XLA path"):
        Proshi(maxit=1, minibatch=(True, 8), sweeping=2)._setup(
            jnp.zeros(16, jnp.float32), F, g, prob.L, 64)
