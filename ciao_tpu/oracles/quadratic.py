"""Quadratic and squared-distance-to-box oracle families.

Capabilities of the reference's sharing test terms
(reference ``test/test_sharing.jl:13-24``):

  * ``Quadratic(diagm(d_i), q_i)``: f_i(x) = 1/2 <x, D_i x> + <q_i, x>
  * ``SqrDistL2(IndBox(lo, hi), eta)``: f_i(x) = (eta/2) dist(x, Box)^2

``DiagQuadratic`` stacks the diagonals ``d (N, n)`` and linear terms
``q (N, n)``; a full-matrix variant ``DenseQuadratic`` stacks ``Q
(N, n, n)`` for generality.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ciao_tpu.oracles.base import SmoothOracle, register_oracle


@register_oracle
@dataclasses.dataclass(frozen=True)
class DiagQuadratic(SmoothOracle):
    d: jnp.ndarray  # (N, n) diagonal of Q_i
    q: jnp.ndarray  # (N, n) linear term

    coordinate_separable = True  # grad = d ⊙ x + q, coordinatewise

    @property
    def num_terms(self) -> int:
        return self.d.shape[0]

    @property
    def dim(self) -> int:
        return self.d.shape[1]

    def value_and_grad_i(self, x, i):
        di, qi = self.d[i], self.q[i]
        val = 0.5 * jnp.vdot(x, di * x).real + jnp.vdot(qi, x).real
        return val, di * x + qi

    def value_and_grad_batch(self, x, idx):
        d_B, q_B = self.d[idx], self.q[idx]
        grads = d_B * x[None, :] + q_B
        vals = 0.5 * jnp.sum(d_B * jnp.abs(x[None, :]) ** 2, axis=-1) + jnp.real(
            jnp.sum(jnp.conj(q_B) * x[None, :], axis=-1)
        )
        return vals, grads

    def value_and_grad_pointwise(self, xs, idx):
        d_B, q_B = self.d[idx], self.q[idx]
        grads = d_B * xs + q_B
        vals = 0.5 * jnp.sum(d_B * jnp.abs(xs) ** 2, axis=-1) + jnp.real(
            jnp.sum(jnp.conj(q_B) * xs, axis=-1)
        )
        return vals, grads

    def grad_pointwise(self, xs, idx):
        return self.value_and_grad_pointwise(xs, idx)[1]

    # ---- contiguous-block fast paths ---------------------------------
    def _slice(self, start, size):
        import jax.lax as lax

        d_B = lax.dynamic_slice_in_dim(self.d, start, size, 0)
        q_B = lax.dynamic_slice_in_dim(self.q, start, size, 0)
        return d_B, q_B

    def grad_block(self, x, start, size: int):
        d_B, q_B = self._slice(start, size)
        return d_B * x[None, :] + q_B

    def grad_pointwise_block(self, xs, start, size: int):
        d_B, q_B = self._slice(start, size)
        return d_B * xs + q_B


@register_oracle
@dataclasses.dataclass(frozen=True)
class DenseQuadratic(SmoothOracle):
    Q: jnp.ndarray  # (N, n, n)
    q: jnp.ndarray  # (N, n)

    @property
    def num_terms(self) -> int:
        return self.Q.shape[0]

    @property
    def dim(self) -> int:
        return self.Q.shape[1]

    def value_and_grad_i(self, x, i):
        Qi, qi = self.Q[i], self.q[i]
        Qx = Qi @ x
        val = 0.5 * jnp.vdot(x, Qx).real + jnp.vdot(qi, x).real
        return val, Qx + qi


@register_oracle
@dataclasses.dataclass(frozen=True)
class SqrDistBox(SmoothOracle):
    """(eta/2) * dist(x, [lo, hi])^2, same box for every term.

    Smooth (gradient = eta * (x - proj_Box(x))), used as a soft box
    constraint in the sharing problem (test_sharing.jl:14-16). ``n_terms``
    fixes the family size since the data is shared across terms.
    """

    lo: jnp.ndarray
    hi: jnp.ndarray
    eta: jnp.ndarray
    n_terms: int = dataclasses.field(metadata={"static": True}, default=1)

    coordinate_separable = True  # grad = eta (x − clip(x)), coordinatewise

    @property
    def num_terms(self) -> int:
        return self.n_terms

    @property
    def dim(self) -> int:
        return -1  # shape-polymorphic

    def _proj(self, x):
        return jnp.clip(x, self.lo, self.hi)

    def value_and_grad_i(self, x, i):
        r = x - self._proj(x)
        val = 0.5 * self.eta * jnp.sum(jnp.abs(r) ** 2)
        return val, self.eta * r

    def value_and_grad_pointwise(self, xs, idx):
        r = xs - self._proj(xs)
        vals = 0.5 * self.eta * jnp.sum(jnp.abs(r) ** 2, axis=-1)
        return vals, self.eta * r

    def grad_pointwise(self, xs, idx):
        return self.value_and_grad_pointwise(xs, idx)[1]

    def grad_pointwise_block(self, xs, start, size: int):
        return self.eta * (xs - self._proj(xs))
