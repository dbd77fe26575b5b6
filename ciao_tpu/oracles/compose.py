"""Oracle combinators: Sum, Zero, affine precompose, and user-defined.

Capabilities of ProximalOperators' ``Sum`` (test_sharing.jl:23),
``Zero()`` default smooth terms (reference ``Finito.jl:78``), and
``Precompose`` (test_logistic_l1.jl:36; the common row-precompose case
is folded into the row oracles directly).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ciao_tpu.oracles.base import SmoothOracle, register_oracle


@register_oracle
@dataclasses.dataclass(frozen=True)
class SumOracle(SmoothOracle):
    """Pointwise sum of oracle families sharing the same index set."""

    terms: Tuple[SmoothOracle, ...]

    @property
    def num_terms(self) -> int:
        return self.terms[0].num_terms

    @property
    def coordinate_separable(self) -> bool:
        return all(t.coordinate_separable for t in self.terms)

    def value_and_grad_i(self, x, i):
        vals, grads = zip(*(t.value_and_grad_i(x, i) for t in self.terms))
        return sum(vals), sum(grads)

    def value_and_grad_batch(self, x, idx):
        vals, grads = zip(*(t.value_and_grad_batch(x, idx) for t in self.terms))
        return sum(vals), sum(grads)

    def grad_sum_batch(self, x, idx, mask=None):
        return sum(t.grad_sum_batch(x, idx, mask) for t in self.terms)

    def grad_sum_diff(self, x1, x2, idx, mask=None):
        return sum(t.grad_sum_diff(x1, x2, idx, mask) for t in self.terms)

    def grad_sum_all(self, x):
        return sum(t.grad_sum_all(x) for t in self.terms)

    def grad_all(self, x):
        return sum(t.grad_all(x) for t in self.terms)

    def value_and_grad_all(self, x):
        vals, grads = zip(*(t.value_and_grad_all(x) for t in self.terms))
        return sum(vals), sum(grads)

    def value_and_grad_pointwise(self, xs, idx):
        vals, grads = zip(*(t.value_and_grad_pointwise(xs, idx) for t in self.terms))
        return sum(vals), sum(grads)

    def grad_pointwise(self, xs, idx):
        return sum(t.grad_pointwise(xs, idx) for t in self.terms)

    def grad_block(self, x, start, size: int):
        return sum(t.grad_block(x, start, size) for t in self.terms)

    def grad_sum_diff_block(self, x1, x2, start, size: int):
        return sum(t.grad_sum_diff_block(x1, x2, start, size) for t in self.terms)

    def grad_pointwise_block(self, xs, start, size: int):
        return sum(t.grad_pointwise_block(xs, start, size) for t in self.terms)


@register_oracle
@dataclasses.dataclass(frozen=True)
class ZeroOracle(SmoothOracle):
    """f_i == 0 for all i — the reference's default F (Finito.jl:78)."""

    coordinate_separable = True

    n_terms: int = dataclasses.field(metadata={"static": True})
    example: jnp.ndarray = None  # shape/dtype template for gradients

    @property
    def num_terms(self) -> int:
        return self.n_terms

    def value_and_grad_i(self, x, i):
        return jnp.zeros((), jnp.real(x).dtype), jnp.zeros_like(x)

    def grad_sum_all(self, x):
        return jnp.zeros_like(x)

    def grad_sum_batch(self, x, idx, mask=None):
        return jnp.zeros_like(x)

    def grad_sum_diff(self, x1, x2, idx, mask=None):
        return jnp.zeros_like(x1)


@register_oracle
@dataclasses.dataclass(frozen=True)
class Precompose(SmoothOracle):
    """f_i(x) = base_i(L_i x + t_i) — ProximalOperators' ``Precompose``
    in stacked-operator form (the reference's tests use the row case
    ``Precompose(LogisticLoss, a_i^T, 1.0)``, test_logistic_l1.jl:36,
    which :class:`~ciao_tpu.oracles.LogisticRows` folds directly; this
    class covers general per-term linear maps).

    ``Lmat`` is (N, m, n); ``shift`` is (N, m) or None. Gradients follow
    the chain rule ∇f_i(x) = L_iᴴ ∇base_i(L_i x + t_i).
    """

    base: SmoothOracle
    Lmat: jnp.ndarray
    shift: Any = None

    @property
    def num_terms(self) -> int:
        return self.Lmat.shape[0]

    def value_and_grad_i(self, x, i):
        y = self.Lmat[i] @ x
        if self.shift is not None:
            y = y + self.shift[i]
        val, gy = self.base.value_and_grad_i(y, i)
        grad = jnp.conj(self.Lmat[i]).T @ gy
        return val, grad


@register_oracle
@dataclasses.dataclass(frozen=True)
class CustomOracle(SmoothOracle):
    """User-defined smooth family: ``fun(x, data_i) -> scalar``.

    ``data`` is any pytree whose leaves are stacked over the leading N
    axis; gradients come from ``jax.value_and_grad`` — the escape hatch
    matching the reference's ability to accept any ProximalOperators
    function as f_i.
    """

    data: Any
    fun: Callable = dataclasses.field(metadata={"static": True})
    n_terms: int = dataclasses.field(metadata={"static": True}, default=0)

    @property
    def num_terms(self) -> int:
        if self.n_terms:
            return self.n_terms
        return jax.tree_util.tree_leaves(self.data)[0].shape[0]

    def value_and_grad_i(self, x, i):
        data_i = jax.tree_util.tree_map(lambda a: a[i], self.data)
        val, grad = jax.value_and_grad(self.fun)(x, data_i)
        return val, grad
