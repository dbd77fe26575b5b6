"""SARAH / ProxSARAH — recursive variance reduction (BEYOND the
reference).

The reference's variance-reduced families keep their gradient estimator
anchored at a FIXED point: SVRG's inner direction is
``∇f_i(w) − ∇f_i(z_full) + μ`` against the outer anchor
(``src/algorithms/SVRG/SVRG_basic.jl:74-80``), and SAGA's against the
per-index table (``SAGA_basic.jl:58-62``). SARAH (Nguyen, Liu,
Scheinberg, Takáč, "SARAH: A Novel Method for Machine Learning Problems
Using Stochastic Recursive Gradient", ICML 2017) instead RECURSES the
estimator through consecutive iterates,

    v_t = (1/B) Σ_B [∇f_i(w_t) − ∇f_i(w_{t−1})] + v_{t−1},

which drives the estimator's variance to zero along the trajectory
(SVRG's stays bounded away until the anchor refresh) and carries the
best known complexity for NONCONVEX finite sums (the SPIDER/SpiderBoost
bound O(√N/ε²)). The composite step is ProxSARAH's damped prox
(Pham, Nguyen, Phan, Tran-Dinh, JMLR 2020):

    y_{t+1} = prox_{γg}(w_t − γ v_t),   w_{t+1} = (1−η) w_t + η y_{t+1}

with η = 1 recovering plain prox-SARAH/SpiderBoost.

TPU mapping: the inner recursion needs ∇f_i at TWO nearby points over
the SAME rows — exactly the fused ``grad_sum_diff_block`` read every
oracle already provides for SVRG/Katyusha (one contiguous-block row DMA
per inner step, two MXU matvecs per tile), so each inner step streams
at the row-read bandwidth floor and no dedicated Pallas kernel is
needed; the outer anchor ``v_0 = ∇f(x̃)`` is the same one-pass
``grad_sum_all`` reduction as SVRG's.

API matches the reference-style facades: ``SARAH(...)(x0, F=F, g=g,
L=L, N=N)`` and ``.iterator(...)``; solution(state) = x̃ (the last
inner iterate of the previous outer step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ciao_tpu.prox import Zero
from ciao_tpu.solvers.base import (
    SolverIterable,
    real_dtype_of,
    run_solver_loop,
)


class SARAHCfg(NamedTuple):
    N: int
    batch: int = 1
    m: int = 1           # stochastic inner steps per outer iterate (static)
    block: bool = False  # contiguous-block sampling (TPU fast path)
    fused: bool = False  # Pallas K-inner-steps-per-launch kernel
    fused_precision: str = "highest"  # MXU dots in fused kernels


class SARAHState(NamedTuple):
    gamma: jnp.ndarray    # scalar stepsize
    eta: jnp.ndarray      # scalar ProxSARAH damping (1 = plain SARAH)
    x_tilde: jnp.ndarray  # (n,) outer iterate
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x_tilde


def _damped_prox(g, w, v, gamma, eta):
    """ProxSARAH update: w ← (1−η)w + η·prox_{γg}(w − γv)."""
    y = g.prox_only(w - gamma * v, gamma)
    return w + eta * (y - w)


@partial(jax.jit, static_argnames=("cfg",))
def sarah_init(F, g, x0, gamma, eta, key, cfg: SARAHCfg) -> SARAHState:
    """x̃ = x0 with no gradient work — the full-pass v₀ belongs to the
    outer step (so solution(init) == x0, matching the SVRG convention
    that a maxit=1-equivalent init returns x0 untouched)."""
    return SARAHState(
        gamma=gamma, eta=eta, x_tilde=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _sarah_inner(F, g, cfg, gamma, eta, sub, w_prev, w, v, steps, k0=0):
    """``steps`` stepwise recursive inner iterations from inner index
    ``k0`` — the (sub, k) stream mirrored exactly (and vectorized) by
    the fused driver's ``_gen_block_starts`` (sampling parity)."""
    from ciao_tpu.solvers.saga import _block_start

    N, B = cfg.N, cfg.batch

    def inner(carry, k):
        w_prev, w, v = carry
        if cfg.block:
            start = _block_start(sub, k, N, B)
            diff = F.grad_sum_diff_block(w, w_prev, start, B)
        else:
            ik = jax.random.fold_in(sub, k)
            i = jax.random.randint(ik, (B,), 0, N, dtype=jnp.int32)
            diff = F.grad_sum_diff(w, w_prev, i)
        v = v + diff / B                     # the SARAH recursion
        w_next = _damped_prox(g, w, v, gamma, eta)
        return (w, w_next, v), None

    (w_prev, w, v), _ = jax.lax.scan(
        inner, (w_prev, w, v), k0 + jnp.arange(steps, dtype=jnp.int32)
    )
    return w_prev, w, v


def _sarah_step_fused(F, g, cfg: SARAHCfg, state: SARAHState,
                      sub) -> SARAHState:
    """Fused outer iterate: the bootstrap full pass runs as ONE
    streaming kernel (ops.coeff_apply_all), the m recursive inner steps
    as K-steps-per-launch kernels (ops.sarah_multistep — the live and
    previous margins come from one stacked (2, TILE) MXU dot per tile,
    so each inner block costs one row pass; measured 7.46 → ~3.7
    ms/outer at the PERF.md config)."""
    from ciao_tpu.ops.fused_block import (
        _pick_tile, coeff_apply_all, oracle_scalar_consts, rows_scale_row,
        rows_scale_slab, sarah_inner_chunked, SLAB_ROWS,
    )
    from ciao_tpu.solvers.saga import _gen_block_starts

    B, m = cfg.batch, cfg.m
    gamma, eta = state.gamma, state.eta
    rows, offs = F.coeff_rows_data()
    scale, mode, lam, aux = oracle_scalar_consts(F, g)
    tile = _pick_tile(B, cfg.N, state.x_tilde.size,
                      esize=rows.dtype.itemsize)
    _, gsum = coeff_apply_all(
        rows, offs[None, :], state.x_tilde[None, :],
        jnp.stack([scale, mode, aux])[None, :], tile,
        precision=cfg.fused_precision, rs1=rows_scale_row(F),
    )
    v0 = gsum[0] / cfg.N
    w_prev = state.x_tilde
    w = _damped_prox(g, w_prev, v0, gamma, eta)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    scalars = jnp.stack([
        scale, f32(gamma), f32(gamma * lam), f32(eta), f32(1.0 / B), mode,
        aux,
    ])[None, :]
    slab = (SLAB_ROWS, cfg.N // SLAB_ROWS)
    ww2, v2, done = sarah_inner_chunked(
        rows, offs.reshape(slab),
        jnp.stack([w_prev, w]), v0[None, :], scalars, B, m,
        lambda k0, K: _gen_block_starts(sub, k0, cfg, K),
        precision=cfg.fused_precision, rs8=rows_scale_slab(F),
    )
    w_prev, w, v = ww2[0], ww2[1], v2[0]
    if done < m:
        _, w, _ = _sarah_inner(
            F, g, cfg, gamma, eta, sub, w_prev, w, v, m - done, k0=done,
        )
    return state._replace(x_tilde=w, it=state.it + 1)


def _sarah_step(F, g, cfg: SARAHCfg, state: SARAHState) -> SARAHState:
    """One outer iterate: the full-gradient bootstrap step plus m
    recursive inner steps. Sampling uses the same stateless
    (key, inner-k) streams as the SVRG/Katyusha inner loops."""
    N, m = cfg.N, cfg.m
    gamma, eta = state.gamma, state.eta
    key, sub = jax.random.split(state.key)
    if cfg.fused:
        return _sarah_step_fused(F, g, cfg, state._replace(key=key), sub)

    v0 = F.grad_sum_all(state.x_tilde) / N
    w_prev = state.x_tilde
    w = _damped_prox(g, w_prev, v0, gamma, eta)
    _, w, _ = _sarah_inner(F, g, cfg, gamma, eta, sub, w_prev, w, v0, m)
    return state._replace(x_tilde=w, key=key, it=state.it + 1)


@partial(jax.jit, static_argnames=("cfg", "steps"))
def sarah_run(F, g, state, cfg: SARAHCfg, steps: int):
    def body(s, _):
        with jax.named_scope("sarah_outer"):
            return _sarah_step(F, g, cfg, s), None

    return jax.lax.scan(body, state, None, length=steps)[0]


@partial(jax.jit, static_argnames=("cfg",))
def sarah_step(F, g, state, cfg: SARAHCfg):
    return _sarah_step(F, g, cfg, state)


@dataclasses.dataclass(frozen=True)
class SARAH:
    """Recursive variance-reduced solver (beyond the reference).

    ``m`` counts stochastic inner steps per outer iterate and defaults
    to N // batch (one epoch of row reads between anchors; one outer
    iterate then costs N + 2·m·batch component gradients). ``gamma``
    defaults to 1/(2 L_max) — the SpiderBoost large-step choice.
    ``eta`` < 1 selects ProxSARAH's damped iterate averaging (the
    nonconvex-composite safeguard); η = 1 is plain prox-SARAH.
    ``maxit`` counts outer iterates."""

    gamma: Optional[float] = None
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100
    m: Optional[int] = None
    batch: int = 1
    eta: float = 1.0
    block_sampling: bool = False  # contiguous inner blocks (TPU fast path)
    fused_precision: str = "highest"  # "default" = bf16-mul/f32-acc MXU dots
    seed: int = 0

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert self.fused_precision in ("highest", "default")
        assert 0.0 < self.eta <= 1.0

    def _setup(self, x0, F, g, L, N):
        x0 = jnp.asarray(x0)
        if N is None:
            if F is None:
                raise ValueError("provide F or N")
            N = F.num_terms
        if F is None:
            from ciao_tpu.oracles import ZeroOracle
            F = ZeroOracle(n_terms=N)
        if g is None:
            g = Zero()
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        else:
            if L is None:
                raise ValueError(
                    "SARAH: provide the smoothness moduli L, or a stepsize γ"
                )
            gamma = 1.0 / (2.0 * jnp.max(jnp.asarray(L, rdt)))
        m = N // self.batch if self.m is None else self.m
        if m < 1:
            raise ValueError("SARAH: m must be >= 1")
        if self.block_sampling and N % self.batch != 0:
            raise ValueError("SARAH block_sampling needs N divisible by batch")
        from ciao_tpu.solvers.base import fused_inner_gate

        fused = fused_inner_gate(self.block_sampling, self.batch, x0, F,
                                 g, N, who="SARAH")
        cfg = SARAHCfg(N=N, batch=self.batch, m=m, block=self.block_sampling,
                       fused=fused, fused_precision=self.fused_precision)
        key = jax.random.PRNGKey(self.seed)
        eta = jnp.asarray(self.eta, rdt)
        init = lambda: sarah_init(F, g, x0, gamma, eta, key, cfg)
        return x0, F, g, cfg, init

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)

        def run_chunk(state, k):
            return sarah_run(F, g, state, cfg, k)

        def disp(it, state):
            print(f"{it:5d} | {float(state.gamma):.3e}")

        state, it = run_solver_loop(
            init, run_chunk, self.maxit, self.verbose, self.freq, disp,
            observe,
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)
        step = lambda s: sarah_step(F, g, s, cfg)
        # the estimator re-anchors from a full pass every outer step,
        # so a storage switch self-heals: rebase is identity
        return SolverIterable(x0_orig, init, step, rebase_fn=lambda s: s)
