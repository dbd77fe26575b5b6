"""Unit tests for the prox library — the layer the reference outsources
to ProximalOperators.jl and we must get numerically exact (SURVEY.md §7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ciao_tpu import prox


def _num_prox(gfun, x, gamma, grid=2001, span=6.0):
    """Brute-force scalar prox via grid search (oracle check)."""
    zs = np.linspace(x - span, x + span, grid)
    vals = [gfun(z) + (z - x) ** 2 / (2 * gamma) for z in zs]
    return zs[int(np.argmin(vals))]


def test_norml1_soft_threshold():
    g = prox.NormL1(lam=2.0)
    x = jnp.array([3.0, -1.0, 0.5, -5.0])
    z, gz = g.prox(x, 0.5)
    np.testing.assert_allclose(z, [2.0, 0.0, 0.0, -4.0], atol=1e-12)
    np.testing.assert_allclose(gz, 2.0 * np.sum(np.abs(np.asarray(z))))


def test_norml1_complex_phase_preserved():
    g = prox.NormL1(lam=1.0)
    x = jnp.array([3.0 + 4.0j, 0.1 + 0.1j])
    z, _ = g.prox(x, 1.0)
    # |x|=5 -> shrink to 4, phase kept
    np.testing.assert_allclose(z[0], (3.0 + 4.0j) * 4.0 / 5.0, atol=1e-12)
    np.testing.assert_allclose(z[1], 0.0)


def test_indbox_clip_and_infinite_bounds():
    g = prox.IndBox(lo=-jnp.inf, hi=1.0)
    x = jnp.array([-100.0, 0.5, 3.0])
    z, gz = g.prox(x, 0.7)
    np.testing.assert_allclose(z, [-100.0, 0.5, 1.0])
    assert float(gz) == 0.0


def test_zero_identity():
    g = prox.Zero()
    x = jnp.array([1.0, -2.0])
    z, gz = g.prox(x, 10.0)
    assert z is x
    assert float(gz) == 0.0


@pytest.mark.parametrize(
    "op,gfun",
    [
        (prox.NormL1(lam=1.3), lambda z: 1.3 * abs(z)),
        (prox.SqrNormL2(lam=0.7), lambda z: 0.35 * z**2),
        (prox.ElasticNet(lam=0.9, mu=0.4), lambda z: 0.9 * abs(z) + 0.2 * z**2),
    ],
)
@pytest.mark.parametrize("x0", [2.3, -0.4, 0.0, -3.7])
@pytest.mark.parametrize("gamma", [0.3, 1.0, 2.5])
def test_separable_prox_vs_bruteforce(op, gfun, x0, gamma):
    z = op.prox_only(jnp.array([x0]), gamma)
    z_ref = _num_prox(gfun, x0, gamma)
    np.testing.assert_allclose(float(z[0]), z_ref, atol=2e-2)


def test_norml2_block_shrink():
    g = prox.NormL2(lam=2.0)
    x = jnp.array([3.0, 4.0])  # norm 5
    z = g.prox_only(x, 1.0)
    np.testing.assert_allclose(z, np.array([3.0, 4.0]) * (1 - 2.0 / 5.0), atol=1e-12)
    # fully killed when gamma*lam >= norm
    z2 = g.prox_only(x, 3.0)
    np.testing.assert_allclose(z2, [0.0, 0.0], atol=1e-12)


def test_indball_projection():
    g = prox.IndBallL2(r=1.0)
    z = g.prox_only(jnp.array([3.0, 4.0]), 1.0)
    np.testing.assert_allclose(np.linalg.norm(z), 1.0, atol=1e-12)
    inside = jnp.array([0.1, 0.2])
    np.testing.assert_allclose(g.prox_only(inside, 1.0), inside)


def test_simplex_projection():
    g = prox.IndSimplex(a=1.0)
    z = g.prox_only(jnp.array([0.9, 0.6, -0.4]), 1.0)
    np.testing.assert_allclose(np.sum(z), 1.0, atol=1e-9)
    assert np.all(np.asarray(z) >= 0)
    np.testing.assert_allclose(z, [0.65, 0.35, 0.0], atol=1e-9)


def test_nuclear_norm_prox():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((5, 4))
    g = prox.NormNuclear(lam=0.5)
    Z = g.prox_only(jnp.asarray(X), 1.0)
    s_in = np.linalg.svd(X, compute_uv=False)
    s_out = np.linalg.svd(np.asarray(Z), compute_uv=False)
    np.testing.assert_allclose(s_out, np.maximum(s_in - 0.5, 0), atol=1e-8)


def test_prox_firm_nonexpansive_random():
    rng = np.random.default_rng(1)
    for op in [prox.NormL1(lam=0.8), prox.ElasticNet(lam=0.3, mu=0.2), prox.IndBox(-1.0, 1.0)]:
        x, y = rng.standard_normal(16), rng.standard_normal(16)
        px = np.asarray(op.prox_only(jnp.asarray(x), 1.0))
        py = np.asarray(op.prox_only(jnp.asarray(y), 1.0))
        assert np.linalg.norm(px - py) <= np.linalg.norm(x - y) + 1e-12
