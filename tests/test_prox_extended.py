"""Tests for the extended prox library (ciao_tpu/prox/extended.py) —
the ProximalOperators.jl surface beyond what the reference's own tests
exercise. Each operator is checked against a brute-force scalar prox
oracle and/or its defining projection/optimality properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu import prox


def _num_prox(gfun, x, gamma, grid=4001, span=6.0):
    # include exactly 0 so sparsity-inducing proxes (NormL0) see it
    zs = np.append(np.linspace(x - span, x + span, grid), 0.0)
    vals = [gfun(z) + (z - x) ** 2 / (2 * gamma) for z in zs]
    return zs[int(np.argmin(vals))]


# ---------------------------------------------------------------- NormL0


def test_norml0_hard_threshold():
    g = prox.NormL0(lam=0.5)
    # threshold: |x| > sqrt(2*gamma*lam) = 1 at gamma=1
    x = jnp.array([2.0, -0.9, 1.1, 0.0, -3.0])
    z = g.prox_only(x, 1.0)
    np.testing.assert_allclose(z, [2.0, 0.0, 1.1, 0.0, -3.0])
    assert float(g.value(z)) == 0.5 * 3


@pytest.mark.parametrize("x0", [2.3, -0.4, 1.01, 0.99, 0.0])
@pytest.mark.parametrize("gamma", [0.5, 1.0])
def test_norml0_vs_bruteforce(x0, gamma):
    g = prox.NormL0(lam=0.5)
    z = float(g.prox_only(jnp.array([x0]), gamma)[0])
    z_ref = _num_prox(lambda u: 0.5 * (u != 0), x0, gamma)
    np.testing.assert_allclose(z, z_ref, atol=2e-2)


# ---------------------------------------------------------------- NormL21


def test_norml21_column_groups():
    g = prox.NormL21(lam=1.0, axis=0)
    X = jnp.array([[3.0, 0.1], [4.0, 0.1]])  # col norms 5, ~0.1414
    Z = g.prox_only(X, 1.0)
    # first column shrinks by (1 - 1/5), second is killed
    np.testing.assert_allclose(Z[:, 0], np.array([3.0, 4.0]) * 0.8, atol=1e-7)
    np.testing.assert_allclose(Z[:, 1], 0.0, atol=1e-7)
    np.testing.assert_allclose(float(g.value(X)), 5.0 + np.sqrt(0.02), rtol=1e-6)


def test_norml21_single_group_matches_norml2():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8)
    a = prox.NormL21(lam=0.7, axis=0).prox_only(jnp.asarray(x), 1.3)
    b = prox.NormL2(lam=0.7).prox_only(jnp.asarray(x), 1.3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


# --------------------------------------------------- L1 ball / NormLinf


def test_indball_l1_projection():
    g = prox.IndBallL1(r=1.0)
    inside = jnp.array([0.3, -0.4, 0.1])
    np.testing.assert_allclose(g.prox_only(inside, 1.0), inside)
    z = np.asarray(g.prox_only(jnp.array([3.0, -4.0, 1.0]), 1.0))
    np.testing.assert_allclose(np.abs(z).sum(), 1.0, atol=1e-7)
    # threshold tau=3: only the dominant coordinate survives
    np.testing.assert_allclose(z, [0.0, -1.0, 0.0], atol=1e-7)


def test_indball_l1_is_euclidean_projection():
    # check against a dense grid on the simplex boundary for a 2-D case
    g = prox.IndBallL1(r=1.0)
    x = np.array([1.0, 0.5])
    z = np.asarray(g.prox_only(jnp.asarray(x), 1.0))
    # brute force over the ball
    ts = np.linspace(-1, 1, 20001)
    best = None
    for t in ts:
        for s in (1.0 - abs(t), -(1.0 - abs(t))):
            cand = np.array([t, s])
            d = np.sum((cand - x) ** 2)
            if best is None or d < best[0]:
                best = (d, cand)
    # interior grid too
    np.testing.assert_allclose(z, best[1], atol=2e-4)


def test_normlinf_moreau():
    g = prox.NormLinf(lam=1.0)
    x = jnp.array([3.0, -4.0, 1.0])
    gamma = 2.0
    z = np.asarray(g.prox_only(x, gamma))
    # Moreau: x = prox_{gamma g}(x) + gamma * prox_{g*/gamma}(x/gamma);
    # here directly: z = x - proj_{2*B1}(x)
    resid = np.asarray(x) - z
    assert np.abs(resid).sum() <= 2.0 + 1e-6
    # optimality via brute force on the max component structure:
    # all coordinates at the max magnitude tie after prox
    mx = np.max(np.abs(z))
    assert np.isclose(np.abs(z[1]), mx)


@pytest.mark.parametrize("gamma", [0.3, 1.0, 2.5])
def test_normlinf_prox_decreases_objective(gamma):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(12)
    g = prox.NormLinf(lam=0.8)
    z = np.asarray(g.prox_only(jnp.asarray(x), gamma))

    def h(u):
        return 0.8 * np.max(np.abs(u)) + np.sum((u - x) ** 2) / (2 * gamma)

    # z must beat x itself and random perturbations of z
    assert h(z) <= h(x) + 1e-9
    for _ in range(200):
        pert = z + rng.standard_normal(12) * 0.01
        assert h(z) <= h(pert) + 1e-9


# ------------------------------------------------------------ orthants


def test_ind_orthants():
    x = jnp.array([1.5, -2.0, 0.0])
    np.testing.assert_allclose(
        prox.IndNonnegative().prox_only(x, 1.0), [1.5, 0.0, 0.0]
    )
    np.testing.assert_allclose(
        prox.IndNonpositive().prox_only(x, 1.0), [0.0, -2.0, 0.0]
    )
    assert float(prox.IndNonnegative().value(jnp.array([1.0, 2.0]))) == 0.0
    assert np.isinf(float(prox.IndNonnegative().value(x)))


def test_indball_linf_clip():
    g = prox.IndBallLinf(r=2.0)
    np.testing.assert_allclose(
        g.prox_only(jnp.array([3.0, -5.0, 1.0]), 1.0), [2.0, -2.0, 1.0]
    )


# -------------------------------------------- halfspace / point / affine


def test_halfspace_projection():
    a = jnp.array([1.0, 1.0])
    g = prox.IndHalfspace(a=a, b=1.0)
    inside = jnp.array([0.2, 0.3])
    np.testing.assert_allclose(g.prox_only(inside, 1.0), inside)
    z = np.asarray(g.prox_only(jnp.array([2.0, 2.0]), 1.0))
    np.testing.assert_allclose(z, [0.5, 0.5], atol=1e-7)
    np.testing.assert_allclose(z @ np.asarray(a), 1.0, atol=1e-7)


def test_indpoint():
    g = prox.IndPoint(p=jnp.array([1.0, -1.0]))
    z, gz = g.prox(jnp.array([5.0, 5.0]), 0.3)
    np.testing.assert_allclose(z, [1.0, -1.0])
    assert float(gz) == 0.0


def test_indaffine_projection():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((2, 5))
    b = rng.standard_normal(2)
    g = prox.IndAffine(A=jnp.asarray(A), b=jnp.asarray(b))
    x = rng.standard_normal(5)
    z = np.asarray(g.prox_only(jnp.asarray(x), 1.0))
    np.testing.assert_allclose(A @ z, b, atol=1e-8)
    # projection residual is orthogonal to the nullspace of A:
    # x - z must lie in the row space of A
    # (z is the closest feasible point)
    ns = np.linalg.svd(A)[2][2:]  # nullspace basis rows
    np.testing.assert_allclose(ns @ (x - z), 0.0, atol=1e-8)
    # idempotent
    z2 = np.asarray(g.prox_only(jnp.asarray(z), 1.0))
    np.testing.assert_allclose(z2, z, atol=1e-8)


def test_indsphere_projection():
    g = prox.IndSphereL2(r=2.0)
    z = np.asarray(g.prox_only(jnp.array([3.0, 4.0]), 1.0))
    np.testing.assert_allclose(np.linalg.norm(z), 2.0, atol=1e-7)
    np.testing.assert_allclose(z, [1.2, 1.6], atol=1e-7)
    # zero input picks a valid point on the sphere
    z0 = np.asarray(g.prox_only(jnp.zeros(3), 1.0))
    np.testing.assert_allclose(np.linalg.norm(z0), 2.0, atol=1e-7)


# ------------------------------------------------- barrier / hinge


@pytest.mark.parametrize("x0", [2.0, 0.5, -1.0, -4.0])
@pytest.mark.parametrize("gamma", [0.3, 1.0])
def test_logbarrier_vs_bruteforce(x0, gamma):
    mu = 0.7
    g = prox.LogBarrier(mu=mu)
    z = float(g.prox_only(jnp.array([x0]), gamma)[0])
    assert z > 0
    # stationarity: (z - x)/gamma - mu/z = 0
    np.testing.assert_allclose((z - x0) / gamma - mu / z, 0.0, atol=1e-5)


@pytest.mark.parametrize("y", [1.0, -1.0])
@pytest.mark.parametrize("x0", [2.0, 1.0, 0.97, 0.2, -0.5, -2.0])
@pytest.mark.parametrize("gamma", [0.25, 1.0, 3.0])
def test_hinge_vs_bruteforce(y, x0, gamma):
    mu = 0.8
    g = prox.HingeLoss(y=jnp.array([y]), mu=mu)
    z = float(g.prox_only(jnp.array([x0]), gamma)[0])
    z_ref = _num_prox(lambda u: mu * max(0.0, 1 - y * u), x0, gamma)
    np.testing.assert_allclose(z, z_ref, atol=2e-2)


def test_extended_prox_nonexpansive():
    rng = np.random.default_rng(7)
    ops = [
        prox.NormL21(lam=0.5),
        prox.NormLinf(lam=0.9),
        prox.IndBallL1(r=2.0),
        prox.IndBallLinf(r=1.5),
        prox.IndNonnegative(),
        prox.IndHalfspace(a=jnp.asarray(rng.standard_normal(16)), b=0.3),
        prox.LogBarrier(mu=0.4),
        prox.HingeLoss(y=jnp.asarray(np.sign(rng.standard_normal(16))), mu=0.6),
    ]
    for op in ops:
        x, y = rng.standard_normal(16), rng.standard_normal(16)
        px = np.asarray(op.prox_only(jnp.asarray(x), 1.0))
        py = np.asarray(op.prox_only(jnp.asarray(y), 1.0))
        assert np.linalg.norm(px - py) <= np.linalg.norm(x - y) + 1e-9, type(op)


def test_extended_ops_in_saga_facade():
    """The new proxes plug into the solver facades unchanged: a tiny
    nonnegative least-squares run via SAGA + IndNonnegative converges to
    the NNLS solution."""
    import ciao_tpu

    rng = np.random.default_rng(5)
    A = rng.standard_normal((32, 4))
    x_true = np.array([1.0, 0.0, 2.0, 0.0])
    b = A @ x_true
    F = ciao_tpu.LeastSquaresRows(A=jnp.asarray(A), b=jnp.asarray(b), scale=32.0)
    L = 32.0 * float(np.max(np.sum(A * A, axis=1)))
    solver = ciao_tpu.SAGA(maxit=20000)
    x, _ = solver(
        jnp.zeros(4), F=F, g=ciao_tpu.prox.IndNonnegative(), L=L, N=32
    )
    x = np.asarray(x)
    assert np.all(x >= -1e-12)
    np.testing.assert_allclose(x, x_true, atol=1e-3)


# ------------------------------------------------------------ MCP / SCAD


@pytest.mark.parametrize("x0", [0.05, 0.4, -0.9, 1.6, -2.5, 4.0, 0.0])
@pytest.mark.parametrize("gamma", [0.5, 1.0])
def test_mcp_vs_bruteforce(x0, gamma):
    lam, beta = 0.5, 3.0  # needs gamma < beta
    g = prox.MCP(lam=lam, beta=beta)

    def pen(u):
        a = abs(u)
        return lam * a - a * a / (2 * beta) if a <= beta * lam \
            else beta * lam * lam / 2

    z = float(g.prox_only(jnp.array([x0]), gamma)[0])
    z_ref = _num_prox(pen, x0, gamma)
    np.testing.assert_allclose(z, z_ref, atol=2e-2)
    np.testing.assert_allclose(float(g.value(jnp.array([x0]))), pen(x0),
                               rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("x0", [0.05, 0.6, -0.8, 1.2, -1.6, 2.2, 0.0])
@pytest.mark.parametrize("gamma", [0.5, 1.0])
def test_scad_vs_bruteforce(x0, gamma):
    lam, a = 0.5, 3.7  # needs gamma < a - 1
    g = prox.SCAD(lam=lam, a=a)

    def pen(u):
        t = abs(u)
        if t <= lam:
            return lam * t
        if t <= a * lam:
            return (2 * a * lam * t - t * t - lam * lam) / (2 * (a - 1))
        return (a + 1) * lam * lam / 2

    z = float(g.prox_only(jnp.array([x0]), gamma)[0])
    z_ref = _num_prox(pen, x0, gamma)
    np.testing.assert_allclose(z, z_ref, atol=2e-2)
    np.testing.assert_allclose(float(g.value(jnp.array([x0]))), pen(x0),
                               rtol=1e-6, atol=1e-12)


def test_mcp_scad_unbiasedness_and_l1_limits():
    """The debiasing property that motivates these penalties: large
    coefficients pass through UNSHRUNK (prox = identity beyond
    beta*lam / a*lam), unlike NormL1's constant shift; small ones are
    thresholded to exactly 0 like L1."""
    big = jnp.array([5.0, -7.0])
    small = jnp.array([0.2, -0.1])
    for g in (prox.MCP(lam=0.5, beta=3.0), prox.SCAD(lam=0.5, a=3.7)):
        np.testing.assert_allclose(np.asarray(g.prox_only(big, 1.0)),
                                   np.asarray(big))
        np.testing.assert_allclose(np.asarray(g.prox_only(small, 1.0)), 0.0)
        # soft-threshold would have moved the big entries by gamma*lam
        l1 = prox.NormL1(lam=jnp.asarray(0.5)).prox_only(big, 1.0)
        assert not np.allclose(np.asarray(l1), np.asarray(big))


def test_mcp_scad_separable_and_solver_integration():
    """Both are elementwise (TP-safe, separable=True) and drive a
    solver: MCP-regularized least squares recovers the planted support
    without the L1 shrinkage bias (coefficients match the oracle
    least-squares refit on the support)."""
    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.utils.problems import make_lasso
    import ciao_tpu

    assert prox.MCP().separable and prox.SCAD().separable
    N, n = 64, 8
    pr = make_lasso(N=N, n=n, p=3, seed=5, well_conditioned=True)
    F = LeastSquaresRows(A=jnp.asarray(pr.A), b=jnp.asarray(pr.b),
                         scale=jnp.asarray(float(N)))
    g = prox.MCP(lam=jnp.asarray(pr.lam), beta=jnp.asarray(20.0))
    x, _ = ciao_tpu.SARAH(maxit=60)(jnp.zeros(n, pr.A.dtype), F=F, g=g,
                                    L=pr.L, N=N)
    x = np.asarray(x)
    supp = np.abs(x) > 1e-8
    # exact support recovery of the planted solution
    np.testing.assert_array_equal(supp, np.abs(np.asarray(pr.x_star)) > 0)
    # stationarity: x is a fixed point of the prox-gradient map
    grad = np.asarray(pr.A).T @ (np.asarray(pr.A) @ x - np.asarray(pr.b))
    gam = 1.0 / (2.0 * float(np.max(pr.L)) / N)  # step w.r.t. mean loss
    fp = np.asarray(g.prox_only(jnp.asarray(x - gam * grad), gam))
    np.testing.assert_allclose(x, fp, atol=1e-6)
    # and the debiasing claim: closer to the LS refit than L1's solution
    A_s = np.asarray(pr.A)[:, supp]
    x_ls, *_ = np.linalg.lstsq(A_s, np.asarray(pr.b), rcond=None)
    gl1 = prox.NormL1(lam=jnp.asarray(pr.lam))
    xl1, _ = ciao_tpu.SARAH(maxit=60)(jnp.zeros(n, pr.A.dtype), F=F, g=gl1,
                                      L=pr.L, N=N)
    err_mcp = np.linalg.norm(x[supp] - x_ls)
    err_l1 = np.linalg.norm(np.asarray(xl1)[supp] - x_ls)
    assert err_mcp < err_l1, (err_mcp, err_l1)
