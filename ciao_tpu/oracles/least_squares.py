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

    def with_storage(self, dtype=jnp.bfloat16):
        """Copy with the data rows STORED in ``dtype``. bf16 storage
        halves HBM traffic in the streaming kernels (the usual
        bottleneck — PERF.md): the fused paths feed bf16 tiles straight
        to the MXU with f32 accumulation, and coefficients/iterates
        stay f32. Gradient accuracy drops to bf16's ~3 decimal digits,
        so use it when the target suboptimality is ≳1e-3·cost — or for
        the early epochs of a two-stage f32 finish."""
        return dataclasses.replace(self, A=self.A.astype(dtype))

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

    # ---- contiguous-block fast paths (dynamic-slice DMA, no gather) --
    def _slice(self, start, size):
        import jax.lax as lax

        A_B = lax.dynamic_slice_in_dim(self.A, start, size, 0)
        b_B = lax.dynamic_slice_in_dim(self.b, start, size, 0)
        return A_B, b_B

    def grad_block(self, x, start, size: int):
        A_B, b_B = self._slice(start, size)
        r = A_B @ x - b_B
        return self.scale * jnp.conj(A_B) * r[:, None]

    def grad_sum_diff_block(self, x1, x2, start, size: int):
        A_B, _ = self._slice(start, size)
        d = A_B @ (x1 - x2)
        return self.scale * (d @ jnp.conj(A_B))

    def grad_pointwise_block(self, xs, start, size: int):
        A_B, b_B = self._slice(start, size)
        r = jnp.sum(A_B * xs, axis=-1) - b_B
        return self.scale * jnp.conj(A_B) * r[:, None]

    # ---- coefficient (rank-1) gradient structure ---------------------
    # grad f_i(x) = c_i(x) · conj(a_i) with SCALAR c_i = scale·(a_i·x − b_i):
    # an (N,) coefficient vector is an EXACT compression of the (N, n)
    # gradient table (SURVEY.md §7's recompute-vs-store tradeoff taken to
    # its limit). Solvers in table="coeff" mode store c instead of s —
    # 1/n the memory and half the per-step HBM traffic.

    supports_coeff: bool = dataclasses.field(
        default=True, metadata={"static": True}
    )
    coeff_mode = 0  # ops.fused_block.MODE_LSQ

    def coeff_rows_data(self):
        """(rows, offsets) consumed by the fused multi-step kernel."""
        return self.A, self.b

    def coeff_batch(self, x, idx):
        """c_i(x) for i in idx."""
        A_B = self.A[idx]
        return self.scale * (A_B @ x - self.b[idx])

    def coeff_block(self, x, start, size: int):
        A_B, b_B = self._slice(start, size)
        return self.scale * (A_B @ x - b_B)

    def coeff_all(self, x):
        return self.scale * (self.A @ x - self.b)

    def apply_rows(self, w, idx):
        """Σ_i w_i · conj(a_i) over i in idx (the table-delta matvec)."""
        return w @ jnp.conj(self.A[idx])

    def apply_rows_block(self, w, start, size: int):
        A_B, _ = self._slice(start, size)
        return w @ jnp.conj(A_B)

    def apply_all(self, w):
        return w @ self._conjA()

    # margin/coeff split for tensor-parallel column sharding: the row
    # product A_B·x is computed on partial columns (then psum'd by the
    # caller) BEFORE the affine/scale part of the coefficient.
    def margin_block(self, x, start, size: int):
        A_B, _ = self._slice(start, size)
        return A_B @ x

    def margin_all(self, x):
        return self.A @ x

    def coeff_from_margin(self, r, start, size: int):
        _, b_B = self._slice(start, size)
        return self.scale * (r - b_B)

    def coeff_from_margin_all(self, r):
        return self.scale * (r - self.b)

    # ---- fused Pallas table-refresh kernels (TPU, f32) ---------------
    # One streaming VMEM pass per block: row gradients + table write +
    # aggregate innovation (ciao_tpu.ops.fused_block). Callers gate on
    # ``ops.fused_block_available``.

    def fused_saga_block(self, s, z, start, size: int,
                         precision: str = "highest"):
        """(s_updated, Σ_B (∇f_i(z) − s_i_old)) on rows [start, start+size)."""
        from ciao_tpu.ops import saga_block_update

        scale2 = jnp.reshape(self.scale, (1, 1)).astype(jnp.float32)
        return saga_block_update(
            self.A, self.b[:, None], s, z[None, :], start, scale2, size,
            precision=precision,
        )

    def fused_finito_block(self, s, gamma, z, start, size: int, inv_N,
                           hat_gamma, precision: str = "highest"):
        """(s_updated, Σ_B (s_new − s_old)·hat_γ/γ_i) with
        s_new = z − γ_i·inv_N·∇f_i(z) on rows [start, start+size)."""
        from ciao_tpu.ops import finito_block_update

        scalars = jnp.stack(
            [
                jnp.asarray(self.scale, jnp.float32),
                jnp.asarray(inv_N, jnp.float32),
                jnp.asarray(hat_gamma, jnp.float32),
            ]
        )[None, :]
        return finito_block_update(
            self.A, self.b[:, None], s, gamma[:, None], z[None, :], start,
            scalars, size, precision=precision,
        )

    def value_and_grad_pointwise(self, xs, idx):
        A_B = self.A[idx]
        r = jnp.sum(A_B * xs, axis=-1) - self.b[idx]
        vals = 0.5 * self.scale * jnp.real(r * jnp.conj(r))
        return vals, self.scale * jnp.conj(A_B) * r[:, None]
