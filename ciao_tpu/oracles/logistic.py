"""Row-wise logistic-loss oracle family.

Mirrors ``Precompose(LogisticLoss([y_i], 1.0), a_i^T, 1.0)`` per-row
objects used by the reference's L1-logistic tests
(reference ``test/test_logistic_l1.jl:34-41``):

    f_i(x) = log(1 + exp(-y_i <a_i, x>))
    grad f_i(x) = -y_i * sigmoid(-y_i <a_i, x>) * a_i

Stored as a stacked matrix ``X (N, n)`` and labels ``y (N,)`` so batched
paths are matmuls. The Lipschitz modulus of grad f_i is
``0.25 * |a_i|^2`` (test_logistic_l1.jl:40).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ciao_tpu.oracles.base import SmoothOracle, register_oracle


def _log1pexp(t):
    # numerically stable log(1 + exp(t))
    return jnp.logaddexp(0.0, t)


@register_oracle
@dataclasses.dataclass(frozen=True)
class LogisticRows(SmoothOracle):
    X: jnp.ndarray  # (N, n) features
    y: jnp.ndarray  # (N,) labels in {-1, +1}

    @property
    def num_terms(self) -> int:
        return self.X.shape[0]

    @property
    def dim(self) -> int:
        return self.X.shape[1]

    def with_storage(self, dtype=jnp.bfloat16):
        """Copy with the feature rows STORED in ``dtype`` (see
        ``LeastSquaresRows.with_storage`` — bf16 halves the streaming
        kernels' HBM traffic at ~3-digit gradient accuracy)."""
        return dataclasses.replace(self, X=self.X.astype(dtype))

    def value_and_grad_i(self, x, i):
        a = self.X[i]
        t = -self.y[i] * jnp.dot(a, x)
        val = _log1pexp(t)
        grad = (-self.y[i] * jax.nn.sigmoid(t)) * a
        return val, grad

    def _margins(self, x, idx):
        X_B = self.X[idx]
        t = -self.y[idx] * (X_B @ x)
        return X_B, t

    def value_and_grad_batch(self, x, idx):
        X_B, t = self._margins(x, idx)
        vals = _log1pexp(t)
        coeff = -self.y[idx] * jax.nn.sigmoid(t)
        return vals, coeff[:, None] * X_B

    def grad_sum_batch(self, x, idx, mask=None):
        X_B, t = self._margins(x, idx)
        coeff = -self.y[idx] * jax.nn.sigmoid(t)
        if mask is not None:
            coeff = jnp.where(mask, coeff, 0)
        return coeff @ X_B

    def grad_sum_all(self, x):
        t = -self.y * (self.X @ x)
        coeff = -self.y * jax.nn.sigmoid(t)
        return coeff @ self.X

    def grad_all(self, x):
        t = -self.y * (self.X @ x)
        coeff = -self.y * jax.nn.sigmoid(t)
        return coeff[:, None] * self.X

    def value_and_grad_all(self, x):
        t = -self.y * (self.X @ x)
        coeff = -self.y * jax.nn.sigmoid(t)
        return _log1pexp(t), coeff[:, None] * self.X

    def grad_pointwise(self, xs, idx):
        X_B = self.X[idx]
        t = -self.y[idx] * jnp.sum(X_B * xs, axis=-1)
        coeff = -self.y[idx] * jax.nn.sigmoid(t)
        return coeff[:, None] * X_B

    def value_and_grad_pointwise(self, xs, idx):
        X_B = self.X[idx]
        t = -self.y[idx] * jnp.sum(X_B * xs, axis=-1)
        coeff = -self.y[idx] * jax.nn.sigmoid(t)
        return _log1pexp(t), coeff[:, None] * X_B

    # ---- coefficient (rank-1) gradient structure ---------------------
    # grad f_i(x) = c_i(x) · x_i with SCALAR c_i = −y_i σ(−y_i x_i·x):
    # (N,) coefficients exactly compress the (N, n) gradient table.

    supports_coeff: bool = dataclasses.field(
        default=True, metadata={"static": True}
    )
    coeff_mode = 1  # ops.fused_block.MODE_LOGISTIC

    def coeff_rows_data(self):
        """(rows, labels) consumed by the fused multi-step kernel."""
        return self.X, self.y

    def coeff_batch(self, x, idx):
        X_B = self.X[idx]
        t = -self.y[idx] * (X_B @ x)
        return -self.y[idx] * jax.nn.sigmoid(t)

    def coeff_block(self, x, start, size: int):
        X_B, y_B = self._slice(start, size)
        t = -y_B * (X_B @ x)
        return -y_B * jax.nn.sigmoid(t)

    def coeff_all(self, x):
        t = -self.y * (self.X @ x)
        return -self.y * jax.nn.sigmoid(t)

    def apply_rows(self, w, idx):
        return w @ self.X[idx]

    def apply_rows_block(self, w, start, size: int):
        X_B, _ = self._slice(start, size)
        return w @ X_B

    def apply_all(self, w):
        return w @ self.X

    # margin/coeff split for tensor-parallel column sharding
    def margin_block(self, x, start, size: int):
        X_B, _ = self._slice(start, size)
        return X_B @ x

    def margin_all(self, x):
        return self.X @ x

    def coeff_from_margin(self, r, start, size: int):
        _, y_B = self._slice(start, size)
        return -y_B * jax.nn.sigmoid(-y_B * r)

    def coeff_from_margin_all(self, r):
        return -self.y * jax.nn.sigmoid(-self.y * r)

    # ---- contiguous-block fast paths (dynamic-slice DMA, no gather) --
    def _slice(self, start, size):
        X_B = jax.lax.dynamic_slice_in_dim(self.X, start, size, 0)
        y_B = jax.lax.dynamic_slice_in_dim(self.y, start, size, 0)
        return X_B, y_B

    def grad_block(self, x, start, size: int):
        X_B, y_B = self._slice(start, size)
        t = -y_B * (X_B @ x)
        return (-y_B * jax.nn.sigmoid(t))[:, None] * X_B

    def grad_sum_diff_block(self, x1, x2, start, size: int):
        X_B, y_B = self._slice(start, size)
        c1 = -y_B * jax.nn.sigmoid(-y_B * (X_B @ x1))
        c2 = -y_B * jax.nn.sigmoid(-y_B * (X_B @ x2))
        return (c1 - c2) @ X_B

    def grad_pointwise_block(self, xs, start, size: int):
        X_B, y_B = self._slice(start, size)
        t = -y_B * jnp.sum(X_B * xs, axis=-1)
        return (-y_B * jax.nn.sigmoid(t))[:, None] * X_B
