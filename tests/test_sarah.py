"""SARAH / ProxSARAH (beyond the reference — recursive variance
reduction).

The reference's estimators anchor at a fixed point (SVRG's outer
anchor, ``SVRG_basic.jl:74-80``; SAGA's table); SARAH recurses through
consecutive iterates. These tests pin (a) the reference tolerances on
the planted problems, (b) the large-step advantage over SVRG at a
MATCHED gradient budget on an ill-conditioned problem, (c) ProxSARAH's
damped-averaging mode, and (d) the streaming-API invariants every
solver obeys.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ciao_tpu
from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.prox import NormL1
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


def test_sarah_converges(lasso):
    """Default γ = 1/(2 L_max), m = N inner steps: reaches the
    reference tolerance on the planted lasso."""
    prob, F, g = lasso
    x, it = ciao_tpu.SARAH(maxit=30)(x0(prob), F=F, g=g, L=prob.L, N=N)
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4
    assert it == 30


def test_sarah_block_minibatch_and_errors(lasso):
    """Contiguous-block sampling (TPU fast path) with a matched-epoch
    inner length converges; misconfiguration raises."""
    prob, F, g = lasso
    x, _ = ciao_tpu.SARAH(maxit=30, batch=8, block_sampling=True, m=N)(
        x0(prob), F=F, g=g, L=prob.L, N=N
    )
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4
    with pytest.raises(ValueError, match="divisible"):
        ciao_tpu.SARAH(maxit=2, batch=7, block_sampling=True)(
            x0(prob), F=F, g=g, L=prob.L, N=N
        )
    with pytest.raises(ValueError, match="smoothness"):
        ciao_tpu.SARAH(maxit=2)(x0(prob), F=F, g=g, N=N)


def test_proxsarah_damping(lasso):
    """η < 1 (ProxSARAH iterate averaging, the nonconvex-composite
    safeguard) still reaches the reference tolerance."""
    prob, F, g = lasso
    x, _ = ciao_tpu.SARAH(maxit=40, eta=0.7)(x0(prob), F=F, g=g, L=prob.L, N=N)
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4
    with pytest.raises(AssertionError):
        ciao_tpu.SARAH(eta=0.0)
    with pytest.raises(AssertionError):
        ciao_tpu.SARAH(eta=1.5)


def test_sarah_beats_svrg_on_ill_conditioned():
    """The recursion + large-step claim, pinned: at a MATCHED budget
    (both m=2N/B inner batches + anchor per outer step) on the
    reference generator's ill-conditioned planted lasso, SARAH with its
    default γ = 1/(2 L_max) must be at least 100x closer to the optimum
    than SVRG with its reference-default γ = 1/(10 L_max). Measured:
    1.1e-1 vs 1.1e+3 at 30 outers (~10,000x)."""
    Np, npx = 1024, 64
    prob = make_lasso(N=Np, n=npx, p=6, seed=1)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
        scale=jnp.asarray(float(Np)),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    z0 = jnp.zeros(npx, prob.A.dtype)
    m = 2 * Np // 8
    xr, _ = ciao_tpu.SARAH(maxit=30, batch=8, block_sampling=True, m=m)(
        z0, F=F, g=g, L=prob.L, N=Np
    )
    xs, _ = ciao_tpu.SVRG(
        maxit=30, m=m, batch=8, block_sampling=True,
        gamma=1.0 / (10 * float(np.max(prob.L))),
    )(z0, F=F, g=g, L=prob.L, N=Np)
    gap_r = prob.cost(np.asarray(xr)) - prob.f_star
    gap_s = prob.cost(np.asarray(xs)) - prob.f_star
    assert gap_r * 100 < gap_s, (gap_r, gap_s)


def test_sarah_iterator_invariants(lasso):
    """Streaming mode: solution(init) == x0 (no gradient work at
    init), the iterator's k-th state matches a maxit=k solve (same
    stateless streams), zero-copy solution view."""
    from ciao_tpu.solvers.base import take

    prob, F, g = lasso
    solver = ciao_tpu.SARAH(maxit=5)
    it = solver.iterator(x0(prob), F=F, g=g, L=prob.L, N=N)
    states = list(take(iter(it), 5))
    np.testing.assert_array_equal(np.asarray(states[0].solution),
                                  np.asarray(x0(prob)))
    x_batch, _ = solver(x0(prob), F=F, g=g, L=prob.L, N=N)
    np.testing.assert_array_equal(np.asarray(states[-1].solution),
                                  np.asarray(x_batch))


def test_sarah_complex_dtype():
    """c128 lasso (the reference dtype sweep) through the recursion:
    γ/η scalars stay real, iterates complex."""
    prob = make_lasso(N=N, n=n, p=3, seed=3, dtype=np.complex128)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b), scale=jnp.asarray(float(N))
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    z0 = jnp.zeros(n, prob.A.dtype)
    x, _ = ciao_tpu.SARAH(maxit=40)(z0, F=F, g=g, L=prob.L, N=N)
    assert x.dtype == prob.A.dtype
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4


def test_sarah_checkpoint_resume_and_storage(tmp_path, lasso):
    """Checkpoint at outer step k and resume: the continuation matches
    the straight-through run exactly (stateless (key, it) streams).
    Narrow bf16 row storage converges to the bf16 resolution floor
    (the recursion re-anchors from a full pass every outer step, so
    rebase is identity)."""
    from ciao_tpu import checkpoint
    from ciao_tpu.solvers.base import loop, take

    prob, F, g = lasso
    solver = ciao_tpu.SARAH(maxit=40)
    z0 = x0(prob)
    st_full = loop(take(iter(solver.iterator(z0, F=F, g=g, L=prob.L, N=N)), 10))
    it1 = solver.iterator(z0, F=F, g=g, L=prob.L, N=N)
    st_mid = loop(take(iter(it1), 5))
    checkpoint.save(tmp_path / "sarah.npz", st_mid)
    restored = checkpoint.load(tmp_path / "sarah.npz")
    it2 = solver.iterator(z0, F=F, g=g, L=prob.L, N=N)
    resumed = loop(take(checkpoint.resume_iterator(it2, restored), 6))
    np.testing.assert_allclose(
        np.asarray(resumed.x_tilde), np.asarray(st_full.x_tilde),
        rtol=1e-12, atol=1e-14,
    )

    prob32 = make_lasso(N=N, n=n, p=3, seed=3, dtype=np.float32,
                        well_conditioned=True)
    F16 = ciao_tpu.LeastSquaresRows(
        A=jnp.asarray(prob32.A, jnp.float32),
        b=jnp.asarray(prob32.b, jnp.float32),
        scale=jnp.asarray(float(N), jnp.float32),
    ).with_storage()
    g32 = NormL1(lam=jnp.asarray(prob32.lam, jnp.float32))
    x, _ = ciao_tpu.SARAH(maxit=60)(
        jnp.zeros(n, jnp.float32), F=F16, g=g32, L=prob32.L, N=N
    )
    assert x.dtype == jnp.float32
    rel = (prob32.cost(np.asarray(x)) - prob32.f_star) / abs(prob32.f_star)
    assert rel < 2e-2, rel


def test_sarah_fused_multistep_matches_stepwise():
    """The K-inner-steps-per-launch fused SARAH kernel (stacked (2,n)
    [w_prev; w] carry, two margins from one MXU dot per tile, in-kernel
    damped prox, one-pass anchor bootstrap) must reproduce the stepwise
    block-sampled recursion: same sampling stream, same math. Covers a
    single-launch m, a stepwise-remainder m, and η < 1 damping."""
    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.sarah import SARAHCfg, sarah_init, sarah_run
    from ciao_tpu.utils.problems import make_lasso

    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gamma = jnp.asarray(1.0 / (2.0 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0v = jnp.zeros(npix, jnp.float32)
    for m, eta in ((24, 1.0), (70, 0.7)):
        etaj = jnp.asarray(eta, jnp.float32)
        cfg_step = SARAHCfg(N=Np, batch=Bp, m=m, block=True)
        st_step = sarah_run(
            F, g, sarah_init(F, g, x0v, gamma, etaj, key, cfg_step),
            cfg_step, 3,
        )
        cfg_fused = cfg_step._replace(fused=True)
        with pltpu.force_tpu_interpret_mode():
            st_fused = sarah_run(
                F, g, sarah_init(F, g, x0v, gamma, etaj, key, cfg_fused),
                cfg_fused, 3,
            )
        assert int(st_fused.it) == int(st_step.it)
        np.testing.assert_allclose(np.asarray(st_fused.x_tilde),
                                   np.asarray(st_step.x_tilde),
                                   rtol=1e-4, atol=1e-6)
        assert np.array_equal(np.asarray(st_fused.key),
                              np.asarray(st_step.key))
