"""SSNM (SAGA with sampled negative momentum — beyond the reference;
Zhou-Shang-Cheng AISTATS 2019, PAPERS.md). Contracts: (a) τ = 1
degenerates to EXACTLY the minibatch-SAGA block step; (b) with the
σ-tuned momentum it beats SAGA ≥50× at a matched step budget on the
ill-conditioned planted lasso (the acceleration it exists for);
(c) fused ≡ stepwise on the same sampling stream; (d) the streaming-API
invariants and the storage-rebase hook every solver obeys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import ciao_tpu
from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers.base import take
from ciao_tpu.solvers.ssnm import SSNM, SSNMCfg, ssnm_init, ssnm_run
from ciao_tpu.utils.problems import make_lasso


@pytest.fixture(scope="module")
def lasso():
    prob = make_lasso(N=64, n=8, p=3, seed=3)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
        scale=jnp.asarray(64.0),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    return prob, F, g


def test_ssnm_converges(lasso):
    prob, F, g = lasso
    x, it = SSNM(maxit=4000, batch=4)(jnp.zeros(8), F=F, g=g, L=prob.L)
    assert it == 4000
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4


def test_ssnm_tau1_is_exactly_minibatch_saga(lasso):
    """At τ = 1 the momentum point is the iterate and the update IS the
    minibatch-SAGA coefficient block step — pinned step-for-step from a
    shared state on the same (key, it) stream (η = γ)."""
    from ciao_tpu.solvers.saga import SAGACfg, SAGAState, _saga_step

    prob, F, g = lasso
    gamma = jnp.asarray(1.0 / (3.0 * np.max(prob.L)))
    key = jax.random.PRNGKey(7)
    x0 = jnp.zeros(8, prob.A.dtype)
    scfg = SSNMCfg(N=64, batch=4)
    st = ssnm_init(F, g, x0, jnp.asarray(1.0, x0.dtype), gamma, key, scfg)
    # the matching SAGA coefficient-block state (bypassing SAGA's
    # z0 = prox((1-γ)x0) init quirk: both start from the SAME point)
    acfg = SAGACfg(N=64, sag=False, batch=4, block=True, coeff=True)
    ast_ = SAGAState(s=st.c, gamma=gamma, av=st.gbar, z=x0, key=key,
                     it=st.it, status=st.status)
    for _ in range(5):
        st = ciao_tpu.solvers.ssnm._ssnm_step(F, g, scfg, st)
        ast_ = _saga_step(F, g, acfg, ast_)
        np.testing.assert_array_equal(np.asarray(st.x), np.asarray(ast_.z))
        np.testing.assert_array_equal(np.asarray(st.c), np.asarray(ast_.s))
        np.testing.assert_array_equal(np.asarray(st.gbar),
                                      np.asarray(ast_.av))


def test_ssnm_accelerates_past_saga_on_ill_conditioned():
    """The point of the momentum: on the reference generator's
    ill-conditioned planted lasso, σ-tuned SSNM lands ≥50× closer than
    SAGA at a MATCHED step budget (same batch, same step count)."""
    Np, npx, B = 1024, 64, 8
    prob = make_lasso(N=Np, n=npx, p=3, seed=0)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
        scale=jnp.asarray(float(Np)),
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    budget = 16_000
    x_saga, _ = ciao_tpu.SAGA(maxit=budget, block_sampling=True, batch=B)(
        jnp.zeros(npx), F=F, g=g, L=prob.L
    )
    # default τ = 1/2 with the coupled η = 1/(3τL) — measured ~1e10×
    # past SAGA here; the pin is a conservative 50×
    x_ssnm, _ = SSNM(maxit=budget, batch=B)(
        jnp.zeros(npx), F=F, g=g, L=prob.L
    )
    gap_saga = prob.cost(np.asarray(x_saga)) - prob.f_star
    gap_ssnm = prob.cost(np.asarray(x_ssnm)) - prob.f_star
    assert gap_ssnm < gap_saga / 50


def test_ssnm_fused_multistep_matches_stepwise():
    """The K-steps-per-launch fused SSNM kernel (coefficient slab AND
    the (d, n) stored-point table in VMEM, momentum point formed
    in-kernel) must reproduce the stepwise path: same sampling stream,
    same math — including the stepwise remainder."""
    Np, npix, Bp = 1024, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    eta = jnp.asarray(1.0 / (3.0 * np.max(prob.L)), jnp.float32)
    tau = jnp.asarray(0.3, jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)
    for steps in (24, 137):
        cfg = SSNMCfg(N=Np, batch=Bp)
        st_s = ssnm_run(F, g, ssnm_init(F, g, x0, tau, eta, key, cfg),
                        cfg, steps)
        cfg_f = cfg._replace(fused=True)
        with pltpu.force_tpu_interpret_mode():
            st_f = ssnm_run(F, g, ssnm_init(F, g, x0, tau, eta, key, cfg_f),
                            cfg_f, steps)
        assert int(st_f.it) == int(st_s.it)
        for fld in ("x", "c", "gbar"):
            np.testing.assert_allclose(
                np.asarray(getattr(st_f, fld)),
                np.asarray(getattr(st_s, fld)),
                rtol=1e-4, atol=1e-5, err_msg=f"{fld} steps={steps}",
            )
        np.testing.assert_allclose(np.asarray(st_f.zb),
                                   np.asarray(st_s.zb),
                                   rtol=1e-4, atol=1e-6)


def test_ssnm_iterator_storage_and_errors(lasso):
    prob, F, g = lasso
    solver = SSNM(batch=4)
    it = solver.iterator(jnp.zeros(8), F=F, g=g, L=prob.L)
    x0 = jnp.zeros(8)
    assert it.x0 is x0 or np.array_equal(np.asarray(it.x0), np.asarray(x0))
    states = list(take(iter(it), 3))
    assert np.array_equal(np.asarray(states[0].x), np.asarray(x0))
    # storage swap + rebase hook: gbar re-derived under the new rows
    from ciao_tpu import checkpoint

    Fq = F.with_storage("int8")
    itq = SSNM(batch=4).iterator(jnp.zeros(8), F=Fq, g=g, L=prob.L)
    stq = states[-1]
    first = next(checkpoint.resume_iterator(itq, stq, rebase=True))
    np.testing.assert_allclose(
        np.asarray(first.gbar), np.asarray(Fq.apply_all(stq.c) / 64),
        rtol=1e-6, atol=1e-8,
    )
    with pytest.raises(ValueError, match="divisible"):
        SSNM(batch=5)(jnp.zeros(8), F=F, g=g, L=prob.L)
    with pytest.raises(ValueError, match="rank-1"):
        from ciao_tpu.oracles import SqrDistBox

        SSNM(batch=4)(jnp.zeros(8),
                      F=SqrDistBox(lo=-1.0, hi=1.0, eta=1.0, n_terms=64),
                      g=g, L=1.0)


def test_dp_ssnm_converges_shards_and_determinism():
    """DPSSNM on the 8-device mesh: one x-sized psum per step, the
    coefficient and stored-point tables sharded by index block, each
    device's momentum point anchored at its own sampled block —
    converges at the reference tolerance, deterministic in the seed."""
    from jax.sharding import PartitionSpec as P

    from ciao_tpu.parallel import DATA_AXIS, DPSSNM, make_mesh, shard_finite_sum

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    prob = make_lasso(N=64, n=8, p=3, seed=3)
    F = shard_finite_sum(
        LeastSquaresRows(
            A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
            scale=jnp.asarray(64.0),
        ),
        mesh,
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    solver = DPSSNM(mesh=mesh, batch=8, maxit=4000, seed=5)
    x, _ = solver(jnp.zeros(8), F=F, g=g, L=prob.L)
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4
    st = next(iter(solver.iterator(jnp.zeros(8), F=F, g=g, L=prob.L)))
    assert st.c.sharding.spec == P(DATA_AXIS)
    assert st.zb.sharding.spec == P(DATA_AXIS, None)
    assert st.x.sharding.spec == P()
    x2, _ = DPSSNM(mesh=mesh, batch=8, maxit=4000, seed=5)(
        jnp.zeros(8), F=F, g=g, L=prob.L
    )
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_tp_ssnm_converges_and_shards():
    """TPSSNM on a (4, 2) mesh: the stored-point table shards over BOTH
    axes, the momentum combination is purely local coordinates, the
    per-step collectives stay one 'model' margin psum + one 'data'
    innovation psum — converges at the reference tolerance with the
    expected layouts."""
    from jax.sharding import PartitionSpec as P

    from ciao_tpu.parallel import (
        DATA_AXIS, MODEL_AXIS, TPSSNM, make_mesh_2d, shard_finite_sum_2d,
    )

    mesh2 = make_mesh_2d(4, 2)
    prob = make_lasso(N=64, n=8, p=3, seed=3)
    F = shard_finite_sum_2d(
        LeastSquaresRows(
            A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
            scale=jnp.asarray(64.0),
        ),
        mesh2,
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    solver = TPSSNM(mesh=mesh2, batch=4, maxit=4000)
    x, _ = solver(jnp.zeros(8), F=F, g=g, L=prob.L)
    assert prob.cost(np.asarray(x)) - prob.f_star < 1e-4
    st = next(iter(solver.iterator(jnp.zeros(8), F=F, g=g, L=prob.L)))
    assert st.c.sharding.spec == P(DATA_AXIS)
    assert st.zb.sharding.spec == P(DATA_AXIS, MODEL_AXIS)
    assert st.x.sharding.spec == P(MODEL_AXIS)
    from ciao_tpu.prox import NormL2

    with pytest.raises(ValueError, match="separable"):
        TPSSNM(mesh=mesh2, batch=4)(
            jnp.zeros(8), F=F, g=NormL2(lam=jnp.asarray(1.0)), L=prob.L
        )


def test_ssnm_streamed_multistep_matches_stepwise():
    """The STREAMED-table fused SSNM (any N — the saga fused_stream
    machinery with the momentum math in-kernel and the (d, n)
    stored-point table VMEM-resident) must reproduce the stepwise path
    exactly, clamps included; masked steps must leave the redirected
    block's stored point untouched (d=64: frequent birthday clamps)."""
    import jax

    from ciao_tpu.solvers.ssnm import SSNMCfg, ssnm_init, ssnm_run

    Np, npix, Bp = 8192, 128, 128
    prob = make_lasso(N=Np, n=npix, p=4, seed=3, dtype=np.float32)
    F32 = LeastSquaresRows(
        A=jnp.asarray(prob.A, jnp.float32),
        b=jnp.asarray(prob.b, jnp.float32),
        scale=jnp.asarray(float(Np), jnp.float32),
    )
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    tau = jnp.asarray(0.5, jnp.float32)
    eta = jnp.asarray(1.0 / (1.5 * np.max(prob.L)), jnp.float32)
    key = jax.random.PRNGKey(5)
    x0 = jnp.zeros(npix, jnp.float32)
    for F in (F32, F32.with_storage("int8")):
        for steps in (77, 96):
            cfg_sw = SSNMCfg(N=Np, batch=Bp)
            st_sw = ssnm_run(F, g, ssnm_init(F, g, x0, tau, eta, key,
                                             cfg_sw), cfg_sw, steps)
            cfg_f = cfg_sw._replace(fused_stream=True)
            st_f = ssnm_run(F, g, ssnm_init(F, g, x0, tau, eta, key,
                                            cfg_f), cfg_f, steps)
            rows_dt = F.A.dtype
            tag = f"{rows_dt} steps={steps}"
            assert int(st_f.it) == int(st_sw.it) == steps + 1
            wide = 1e-4 if rows_dt == jnp.float32 else 1e-2
            np.testing.assert_allclose(np.asarray(st_f.x),
                                       np.asarray(st_sw.x),
                                       rtol=wide, atol=1e-6, err_msg=tag)
            np.testing.assert_allclose(np.asarray(st_f.zb),
                                       np.asarray(st_sw.zb),
                                       rtol=wide, atol=1e-6, err_msg=tag)
            c_atol = max(1e-3, 1e-4 * float(np.abs(st_sw.c).max()))
            np.testing.assert_allclose(np.asarray(st_f.c),
                                       np.asarray(st_sw.c),
                                       rtol=max(wide, 1e-3), atol=c_atol,
                                       err_msg=tag)
