"""Row-wise least-squares oracle family.

Mirrors the capability of ``LeastSquares(A[i:i,:], b[i:i], N)`` per-row
objects used by the reference's Lasso tests
(reference ``test/test_lasso.jl:50-57``):

    f_i(x) = (scale / 2) * |<a_i, x> - b_i|^2
    grad f_i(x) = scale * conj(a_i) * (<a_i, x> - b_i)

but stored as ONE stacked matrix ``A (N, n)`` so every batched path is a
gather + matmul on the MXU. Complex dtypes supported (the reference test
sweeps ComplexF32/ComplexF64, ``test_lasso.jl:3``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ciao_tpu.oracles.base import SmoothOracle, register_oracle


@register_oracle
@dataclasses.dataclass(frozen=True)
class LeastSquaresRows(SmoothOracle):
    A: jnp.ndarray  # (N, n)
    b: jnp.ndarray  # (N,)
    scale: jnp.ndarray  # scalar weight (the reference passes N)

    @property
    def num_terms(self) -> int:
        return self.A.shape[0]

    @property
    def dim(self) -> int:
        return self.A.shape[1]

    def _conjA(self):
        return jnp.conj(self.A) if jnp.iscomplexobj(self.A) else self.A

    def value_and_grad_i(self, x, i):
        a = self.A[i]
        r = jnp.vdot(jnp.conj(a), x) - self.b[i]  # <a, x> - b (no conj on a)
        val = 0.5 * self.scale * jnp.real(r * jnp.conj(r))
        grad = self.scale * jnp.conj(a) * r
        return val, grad

    # ---- fused MXU paths --------------------------------------------
    def _residual(self, x, idx):
        A_B = self.A[idx]
        return A_B, A_B @ x - self.b[idx]

    def value_and_grad_batch(self, x, idx):
        A_B, r = self._residual(x, idx)
        vals = 0.5 * self.scale * jnp.real(r * jnp.conj(r))
        grads = self.scale * jnp.conj(A_B) * r[:, None]
        return vals, grads

    def grad_sum_batch(self, x, idx, mask=None):
        A_B, r = self._residual(x, idx)
        if mask is not None:
            r = jnp.where(mask, r, 0)
        return self.scale * (r @ jnp.conj(A_B))

    def grad_sum_diff(self, x1, x2, idx, mask=None):
        # sum_i grad f_i(x1) - grad f_i(x2) = scale * A_B^H A_B (x1 - x2)
        A_B = self.A[idx]
        d = A_B @ (x1 - x2)
        if mask is not None:
            d = jnp.where(mask, d, 0)
        return self.scale * (d @ jnp.conj(A_B))

    def grad_sum_all(self, x):
        r = self.A @ x - self.b
        return self.scale * (r @ self._conjA())

    def grad_all(self, x):
        r = self.A @ x - self.b
        return self.scale * self._conjA() * r[:, None]

    def value_and_grad_all(self, x):
        r = self.A @ x - self.b
        vals = 0.5 * self.scale * jnp.real(r * jnp.conj(r))
        return vals, self.scale * self._conjA() * r[:, None]

    def grad_pointwise(self, xs, idx):
        A_B = self.A[idx]
        r = jnp.sum(A_B * xs, axis=-1) - self.b[idx]
        return self.scale * jnp.conj(A_B) * r[:, None]

    def value_and_grad_pointwise(self, xs, idx):
        A_B = self.A[idx]
        r = jnp.sum(A_B * xs, axis=-1) - self.b[idx]
        vals = 0.5 * self.scale * jnp.real(r * jnp.conj(r))
        return vals, self.scale * jnp.conj(A_B) * r[:, None]
