"""Deep accuracy for the PRIMAL-DUAL class (round 5): the planted
any-scale fused lasso (rank-1 KKT construction), the compensated
Condat-Vũ driver, and the certified TV reduced solve
(`solvers/deep_pd.py`). Completes the deep-accuracy matrix over every
expressible problem class — finite-sum (`deep_solve`), sharing
(`deep_solve_sharing`), analysis sparsity h(Kx) (this).

Reference anchor: none — h(Kx) is the capability class the
prox-of-g-only reference cannot express; the planted-optimum test
DISCIPLINE is SURVEY §4's."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu import (
    FirstDifference,
    LeastSquaresRows,
    NormL1,
    deep_solve_pd,
    tv_refine,
)
from ciao_tpu.solvers.deep_pd import pd_run_compensated
from ciao_tpu.utils import make_fused_lasso_planted


def _oracle_A(A, b, dtype=jnp.float32):
    N = A.shape[0]
    return LeastSquaresRows(
        A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype),
        scale=jnp.asarray(float(N), dtype),
    )


def _oracle(p, dtype=jnp.float32):
    N = p.A.shape[0]
    return LeastSquaresRows(
        A=jnp.asarray(p.A, dtype), b=jnp.asarray(p.b, dtype),
        scale=jnp.asarray(float(N), dtype),
    )


def test_planted_construction_is_exact():
    """The rank-1 dual correction satisfies the fused-lasso KKT system
    to f64 roundoff and the planted point is a strict minimum."""
    N, n = 2048, 128
    p = make_fused_lasso_planted(N=N, n=n, jumps=6, seed=0)
    r = p.A @ p.x_star - p.b
    Dt_v = np.zeros(n)
    Dt_v[:-1] -= p.v_star
    Dt_v[1:] += p.v_star
    kkt = p.A.T @ r + Dt_v
    assert np.max(np.abs(kkt)) < 1e-10
    assert abs(p.cost(p.x_star) - p.f_star) < 1e-10
    # dual validity: λ·sign at jumps, strictly interior off them
    d = np.diff(p.x_star)
    J = d != 0
    np.testing.assert_array_equal(p.v_star[J], p.lam * np.sign(d[J]))
    assert np.max(np.abs(p.v_star[~J])) <= 0.6 * p.lam + 1e-12
    rng = np.random.default_rng(1)
    for _ in range(8):
        assert p.cost(p.x_star + 1e-3 * rng.standard_normal(n)) > p.f_star


@pytest.mark.parametrize("seed", [0, 2])
def test_deep_solve_pd_certified_fused_lasso(seed):
    """f32 Condat-Vũ + certified TV reduced solve lands ORDERS below
    the structural (n/jumps)·eps CV floor (~5e-6 measured unrefined):
    rel ≤ 1e-8 vs the exact f64 optimum, exact jump-set recovery."""
    N, n = 8192, 256
    p = make_fused_lasso_planted(N=N, n=n, jumps=8, seed=seed)
    F = _oracle(p)
    h = NormL1(lam=jnp.asarray(p.lam, jnp.float32))
    x, info = deep_solve_pd(
        jnp.zeros(n, jnp.float32), F, h=h, K=FirstDifference(), N=N,
        chunk=1024, chunk_steps=512, max_steps=32768)
    rel = (p.cost(np.asarray(x)) - p.f_star) / abs(p.f_star)
    assert info.refined and info.certified
    assert 0 <= rel < 1e-8
    d = np.abs(np.diff(np.asarray(x, np.float64)))
    true_J = np.abs(np.diff(p.x_star)) > 0
    assert np.all(d[true_J] > 1e-2)
    assert np.all(d[~true_J] == 0.0)  # flat runs EXACT in f32


def test_deep_solve_pd_beats_unrefined_floor():
    """The same budget WITHOUT the reduced solve sits at the
    first-order TV noise floor — the refinement is what removes it."""
    N, n = 8192, 256
    p = make_fused_lasso_planted(N=N, n=n, jumps=8, seed=1)
    F = _oracle(p)
    h = NormL1(lam=jnp.asarray(p.lam, jnp.float32))
    kw = dict(N=N, chunk=1024, chunk_steps=512, max_steps=4096)
    x_ref, i_ref = deep_solve_pd(jnp.zeros(n, jnp.float32), F, h=h,
                                 K=FirstDifference(), **kw)
    x_raw, i_raw = deep_solve_pd(jnp.zeros(n, jnp.float32), F, h=h,
                                 K=FirstDifference(), refine=False, **kw)
    rel_ref = (p.cost(np.asarray(x_ref)) - p.f_star) / p.f_star
    rel_raw = (p.cost(np.asarray(x_raw)) - p.f_star) / p.f_star
    assert i_ref.refined and not i_raw.refined
    assert rel_ref < 1e-8 < rel_raw


def test_tv_refine_rejects_unidentified_iterate():
    """A garbage point (no identified structure) must FAIL the
    certificate — the solved jump signs cannot match the assumed ones
    on a dense pseudo-jump set."""
    N, n = 2048, 128
    p = make_fused_lasso_planted(N=N, n=n, jumps=6, seed=3)
    F = _oracle(p)
    rng = np.random.default_rng(0)
    x_bad = jnp.asarray(rng.standard_normal(n), jnp.float32)
    _, certified, _ = tv_refine(F, x_bad, p.lam, chunk=1024)
    assert not certified


def test_pd_run_compensated_matches_plain_in_f64():
    """The compensated driver is the SAME iteration — in f64, where
    compensation is invisible at test tolerance, trajectories match
    the plain pd_run to reduction-order noise."""
    from ciao_tpu.solvers.primal_dual import CondatVu, pd_run

    N, n = 512, 64
    p = make_fused_lasso_planted(N=N, n=n, jumps=4, seed=0)
    F = _oracle(p, jnp.float64)
    h = NormL1(lam=jnp.asarray(p.lam, jnp.float64))
    K = FirstDifference()
    facade = CondatVu()
    x0, F, g, h, K, cfg, init = facade._setup(
        jnp.zeros(n, jnp.float64), F, None, h, K, p.L, N)
    s_plain = pd_run(F, g, h, K, init(), cfg, 200)
    s_comp = pd_run_compensated(F, g, h, K, init(), cfg, 200, 128)
    np.testing.assert_allclose(np.asarray(s_comp.x), np.asarray(s_plain.x),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_comp.y), np.asarray(s_plain.y),
                               rtol=0, atol=1e-11)


def test_deep_solve_pd_chambolle_pock_path():
    """F = None (no finite-sum term): the driver takes the plain
    pd_run leg and still solves — small TV denoise against the
    subdifferential certificate."""
    from ciao_tpu.prox import SqrDistPoint

    rng = np.random.default_rng(3)
    n = 48
    truth = np.repeat([0.0, 2.0, -1.0], n // 3)
    b = jnp.asarray(truth + 0.2 * rng.standard_normal(n), jnp.float64)
    lam = 0.3
    x, info = deep_solve_pd(
        jnp.zeros(n, jnp.float64), g=SqrDistPoint(b=b, rho=jnp.asarray(1.0)),
        h=NormL1(lam=jnp.asarray(lam)), K=FirstDifference(), N=1,
        tau=0.25, sigma=1.0, chunk_steps=2000, max_steps=40000,
        plateau_rtol=1e-14)
    assert not info.refined  # no dense rows — refine not applicable
    # exact TV certificate: v = cumsum(x − b) interior / ±λ at jumps
    xn = np.asarray(x)
    v = np.cumsum(xn - np.asarray(b))[:-1]
    d = np.diff(xn)
    J = np.abs(d) > 1e-6
    assert np.max(np.abs(v[~J])) <= lam * (1 + 1e-6)
    np.testing.assert_allclose(v[J], lam * np.sign(d[J]), rtol=0, atol=1e-6)


def test_deep_solve_pd_dp_certified_on_mesh():
    """The primal-dual deep route over the 8-device DP mesh
    (`parallel.deep_solve_pd_dp`): DPCondatVu with per-shard
    compensated chunks + the certified TV reduced solve evaluated on
    the ROW-SHARDED oracle (auto-partitioned jits) — same accuracy
    contract as single-chip."""
    from ciao_tpu.parallel import deep_solve_pd_dp, make_mesh, \
        shard_finite_sum

    N, n = 8192, 256
    p = make_fused_lasso_planted(N=N, n=n, jumps=8, seed=0)
    mesh = make_mesh()
    Fd = shard_finite_sum(_oracle(p), mesh)
    h = NormL1(lam=jnp.asarray(p.lam, jnp.float32))
    x, info = deep_solve_pd_dp(
        jnp.zeros(n, jnp.float32), Fd, h=h, K=FirstDifference(), N=N,
        mesh=mesh, chunk_steps=512, max_steps=16384, polish_chunk=1024)
    rel = (p.cost(np.asarray(x)) - p.f_star) / abs(p.f_star)
    assert info.refined and info.certified
    assert 0 <= rel < 1e-8
    d = np.abs(np.diff(np.asarray(x, np.float64)))
    assert np.all(d[np.abs(np.diff(p.x_star)) == 0] == 0.0)


def test_tv_refine_constant_iterate_no_jumps():
    """k = 1 edge case (constant iterate → empty jump set): the
    reduced solve degenerates to one global least-squares mean and the
    certificate must evaluate without error (it fails honestly here —
    the true optimum has jumps)."""
    N, n = 2048, 128
    p = make_fused_lasso_planted(N=N, n=n, jumps=6, seed=5)
    F = _oracle(p)
    x_const = jnp.ones(n, jnp.float32) * 0.5
    x_hat, certified, v = tv_refine(F, x_const, p.lam, chunk=1024)
    assert isinstance(certified, bool) and not certified
    assert x_hat.shape == (n,) and v.shape == (n - 1,)


def test_tv_refine_rejects_non_lsq_oracle():
    """tv_refine solves the QUADRATIC reduced system — a non-LSQ
    margin oracle must raise rather than be silently mis-solved, and
    deep_solve_pd must simply skip refinement for it."""
    from ciao_tpu import LogisticRows

    rng = np.random.default_rng(0)
    N, n = 256, 32
    A = jnp.asarray(rng.standard_normal((N, n)), jnp.float32)
    yv = jnp.asarray(np.sign(rng.standard_normal(N)), jnp.float32)
    F = LogisticRows(X=A, y=yv)
    with pytest.raises(ValueError, match="LeastSquaresRows"):
        tv_refine(F, jnp.zeros(n, jnp.float32), 0.1, chunk=64)
    x, info = deep_solve_pd(
        jnp.zeros(n, jnp.float32), F, h=NormL1(lam=jnp.asarray(0.05)),
        K=FirstDifference(), N=N, L=np.full(N, float(N)),
        tau=1e-3, chunk=64, chunk_steps=64, max_steps=256)
    assert not info.refined


def test_tv_refine_certificate_soundness_under_corruption():
    """Soundness fuzz: feed the reduced solve deliberately WRONG
    structures — a dropped true jump, a spurious extra jump, a
    flipped jump sign — by crafting iterates with those jump patterns.
    Every corruption must fail the certificate (the refined point of a
    wrong structure is not the optimum, and returning it certified
    would be the one unacceptable failure mode)."""
    N, n = 4096, 128
    p = make_fused_lasso_planted(N=N, n=n, jumps=6, seed=7)
    F = _oracle(p)
    xs = p.x_star.copy()
    J = np.nonzero(np.abs(np.diff(xs)) > 0)[0]

    corruptions = []
    # drop a true jump: merge the two segments around J[2]
    x_drop = xs.copy()
    x_drop[J[2] + 1:J[3] + 1] = x_drop[J[2]]
    corruptions.append(x_drop)
    # spurious jump: split a long segment in half with a visible step
    x_spur = xs.copy()
    mid = (J[0] + 1 + J[1]) // 2
    x_spur[mid:J[1] + 1] += 2.0
    corruptions.append(x_spur)
    # flipped sign: negate the step of one jump
    x_flip = xs.copy()
    lvl_lo, lvl_hi = x_flip[J[1]], x_flip[J[1] + 1]
    x_flip[J[1] + 1:J[2] + 1] = lvl_lo - (lvl_hi - lvl_lo)
    corruptions.append(x_flip)

    for x_bad in corruptions:
        _, certified, _ = tv_refine(F, jnp.asarray(x_bad, jnp.float32),
                                    p.lam, chunk=1024)
        assert not certified
    # the TRUE structure (x* itself) certifies
    _, certified, _ = tv_refine(F, jnp.asarray(xs, jnp.float32),
                                p.lam, chunk=1024)
    assert certified


# ---------------------------------------------------------------------------
# three-term fused lasso (λ₁‖x‖₁ + λ₂‖Dx‖₁, round 5 late)
# ---------------------------------------------------------------------------

def test_three_term_construction_is_exact():
    from ciao_tpu.utils import make_three_term_planted

    N, n = 2048, 128
    p = make_three_term_planted(N=N, n=n, jumps=6, seed=0)
    Dt_v = np.zeros(n)
    Dt_v[:-1] -= p.v_star
    Dt_v[1:] += p.v_star
    kkt = p.A.T @ (p.A @ p.x_star - p.b) + p.u_star + Dt_v
    assert np.max(np.abs(kkt)) < 1e-10
    assert abs(p.cost(p.x_star) - p.f_star) < 1e-10
    assert np.sum(p.x_star == 0) > n // 4        # material sparsity
    rng = np.random.default_rng(1)
    for _ in range(8):
        assert p.cost(p.x_star + 1e-3 * rng.standard_normal(n)) > p.f_star


@pytest.mark.parametrize("seed", [0, 2])
def test_deep_solve_pd_three_term_certified(seed):
    """The FULL three-term objective to certified accuracy: both
    structures exact in f32 (zero segments exactly zero, flat runs
    exactly flat), rel ≤ 1e-9 vs the planted f64 optimum."""
    from ciao_tpu.utils import make_three_term_planted

    N, n = 8192, 256
    p = make_three_term_planted(N=N, n=n, jumps=9, seed=seed)
    F = _oracle_A(p.A, p.b)
    x, info = deep_solve_pd(
        jnp.zeros(n, jnp.float32), F,
        g=NormL1(lam=jnp.asarray(p.lam1, jnp.float32)),
        h=NormL1(lam=jnp.asarray(p.lam2, jnp.float32)),
        K=FirstDifference(), N=N,
        chunk=1024, chunk_steps=512, max_steps=32768)
    rel = (p.cost(np.asarray(x)) - p.f_star) / abs(p.f_star)
    assert info.refined and info.certified
    assert 0 <= rel < 1e-9
    xn = np.asarray(x, np.float64)
    assert np.all(xn[p.x_star == 0] == 0.0)
    d = np.abs(np.diff(xn))
    assert np.all(d[np.abs(np.diff(p.x_star)) == 0] == 0.0)


def test_tv_refine3_reduces_to_two_term_at_lam1_zero():
    """λ₁ = 0 degenerates tv_refine3's interval certificate to the
    exact cumsum of tv_refine: same decision and same point on the
    two-term planted instance."""
    from ciao_tpu import tv_refine3

    N, n = 4096, 128
    p = make_fused_lasso_planted(N=N, n=n, jumps=6, seed=4)
    F = _oracle(p)
    x_good = jnp.asarray(p.x_star, jnp.float32)
    xh2, cert2, _ = tv_refine(F, x_good, p.lam, chunk=1024)
    xh3, cert3 = tv_refine3(F, x_good, 0.0, p.lam, chunk=1024)
    assert cert2 and cert3
    np.testing.assert_allclose(np.asarray(xh3), np.asarray(xh2),
                               rtol=0, atol=2e-6)


def test_tv_refine3_soundness_under_corruption():
    """Corrupted structures must fail the three-term certificate:
    a zeroed-out true nonzero segment, and an un-zeroed true zero
    segment (both change the ℓ1 pattern the reduced solve assumes)."""
    from ciao_tpu import tv_refine3
    from ciao_tpu.utils import make_three_term_planted

    N, n = 4096, 128
    p = make_three_term_planted(N=N, n=n, jumps=6, seed=3)
    F = _oracle_A(p.A, p.b)
    xs = p.x_star.copy()
    seg_lvls = np.unique(np.cumsum(np.concatenate(
        ([0], (np.diff(xs) != 0).astype(int)))))
    del seg_lvls  # segment bookkeeping below uses masks directly

    nz_mask = xs != 0
    x_zeroed = xs.copy()
    # zero out the first nonzero segment entirely
    first_nz = np.nonzero(nz_mask)[0][0]
    lvl = xs[first_nz]
    x_zeroed[xs == lvl] = 0.0
    x_unzeroed = xs.copy()
    first_z = np.nonzero(~nz_mask)[0][0]
    zlvl_mask = (xs == 0)
    # lift the first zero segment to a visible level
    seg_end = first_z
    while seg_end < n and zlvl_mask[seg_end]:
        seg_end += 1
    x_unzeroed[first_z:seg_end] = 3.0

    for x_bad in (x_zeroed, x_unzeroed):
        _, cert = tv_refine3(F, jnp.asarray(x_bad, jnp.float32),
                             p.lam1, p.lam2, chunk=1024)
        assert not cert
    _, cert = tv_refine3(F, jnp.asarray(xs, jnp.float32),
                         p.lam1, p.lam2, chunk=1024)
    assert cert


def test_deep_solve_pd_tp_certified_on_2d_mesh():
    """The primal-dual deep route on the ("data","model") mesh
    (`parallel.deep_solve_pd_tp`): TPCondatVu (scalar-halo stencil) to
    identification + the certified reduced solve on the 2-D-sharded
    oracle — same accuracy contract as single-chip/DP, covering the
    three-term objective."""
    from ciao_tpu.parallel import deep_solve_pd_tp, make_mesh_2d, \
        shard_finite_sum_2d
    from ciao_tpu.utils import make_three_term_planted

    N, n = 8192, 256
    p = make_three_term_planted(N=N, n=n, jumps=9, seed=0)
    mesh = make_mesh_2d(4, 2)
    Fd = shard_finite_sum_2d(_oracle_A(p.A, p.b), mesh)
    x, info = deep_solve_pd_tp(
        jnp.zeros(n, jnp.float32), Fd,
        g=NormL1(lam=jnp.asarray(p.lam1, jnp.float32)),
        h=NormL1(lam=jnp.asarray(p.lam2, jnp.float32)),
        K=FirstDifference(), N=N, mesh=mesh,
        chunk_steps=512, max_steps=16384, refine_chunk=1024)
    rel = (p.cost(np.asarray(x)) - p.f_star) / abs(p.f_star)
    assert info.refined and info.certified
    assert 0 <= rel < 1e-8
    xn = np.asarray(x, np.float64)
    assert np.all(xn[p.x_star == 0] == 0.0)
