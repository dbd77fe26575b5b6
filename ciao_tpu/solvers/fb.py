"""Forward-backward splitting (ISTA) and its accelerated variant
(FISTA) — deterministic full-gradient baselines (BEYOND the reference).

The reference ships only incremental/stochastic solvers, but its users
come from the ProximalAlgorithms.jl ecosystem whose ``ForwardBackward``
/ ``FastForwardBackward`` are the standard deterministic baselines every
experiment compares against (the reference's own companion package —
``Project.toml:9`` pulls ProximalAlgorithms for IterationTools). They
complete the library here so a switching user can reproduce those
comparisons in-framework:

    x⁺ = prox_{γg}(y − γ∇f(y)),        f = (1/N) Σ_i f_i

with y = x (ISTA) or the Nesterov extrapolation
y⁺ = x⁺ + ((t−1)/t⁺)(x⁺ − x), t⁺ = (1+√(1+4t²))/2 (FISTA, the O(1/k²)
rate). On TPU one step is ONE full-pass fused row read
(``grad_sum_all`` — the same streaming reduction as the SVRG anchor)
plus an O(n) prox: entirely bandwidth-bound, no table, no sampling.

Default γ = 1/mean(L): each f_i has modulus L_i, so the full smooth
term (1/N)Σf_i has modulus ≤ mean(L_i).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ciao_tpu.prox import Zero
from ciao_tpu import runtime
from ciao_tpu.solvers.base import (
    SolverIterable,
    real_dtype_of,
    run_solver_loop,
)


class FBCfg(NamedTuple):
    N: int
    fast: bool = False   # Nesterov extrapolation (FISTA)
    fused: bool = False  # one-pass Pallas full-gradient (coeff_apply_all)
    fused_precision: str = "highest"  # MXU dots in the fused pass


class FBState(NamedTuple):
    gamma: jnp.ndarray   # scalar stepsize
    t: jnp.ndarray       # scalar momentum sequence (1.0 when not fast)
    x: jnp.ndarray       # (n,) iterate
    y: jnp.ndarray       # (n,) extrapolated point (== x when not fast)
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


@partial(jax.jit, static_argnames=("cfg",))
def fb_init(F, g, x0, gamma, cfg: FBCfg) -> FBState:
    """x = y = x0, t = 1 — solution(init) == x0 (init is iteration #1,
    the framework-wide convention)."""
    rdt = jnp.zeros((), jnp.result_type(x0)).real.dtype
    return FBState(
        gamma=gamma, t=jnp.ones((), rdt), x=x0, y=x0,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def full_gradient(F, N, y, fused: bool, precision: str = "highest"):
    """∇((1/N)Σf_i)(y) as ONE streaming pass when ``fused`` (the fused
    ``coeff_apply_all`` reads coefficients + gradient sum together; the
    XLA ``grad_sum_all`` costs ~2 passes — measured 3.24 → ~1.8 ms/step
    at the PERF.md config). Shared by every deterministic full-gradient
    solver (FB/FISTA here, Davis-Yin, Condat-Vũ)."""
    if fused:
        from ciao_tpu.ops.fused_block import (
            _pick_tile, coeff_apply_all, oracle_scalar_consts,
            rows_scale_row,
        )

        rows, offs = F.coeff_rows_data()
        scale, mode, _, aux = oracle_scalar_consts(F, None)
        tile = _pick_tile(N, N, y.size, esize=rows.dtype.itemsize)
        _, gsum = coeff_apply_all(
            rows, offs[None, :], y[None, :],
            jnp.stack([scale, mode, aux])[None, :], tile,
            precision=precision, rs1=rows_scale_row(F),
        )
        return gsum[0] / N
    return F.grad_sum_all(y) / N


def fused_full_grad_available(F, x0, N) -> bool:
    """Gate for the one-pass fused full-gradient read (mirrors the
    per-family fused gates: TPU backend, f32, lane-aligned n, rank-1
    coefficient oracle)."""
    if x0.dtype != jnp.float32:
        return False
    from ciao_tpu.ops.fused_block import _pick_tile

    return (
        runtime.on_tpu()
        and x0.size % 128 == 0
        and _pick_tile(N, N, x0.size) >= 128
        and hasattr(F, "coeff_rows_data")
        and getattr(F, "supports_coeff", False)
    )


def _fb_step(F, g, cfg: FBCfg, state: FBState) -> FBState:
    gamma = state.gamma
    grad = full_gradient(F, cfg.N, state.y, cfg.fused, cfg.fused_precision)
    x_new = g.prox_only(state.y - gamma * grad, gamma)
    if cfg.fast:
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * state.t * state.t))
        y_new = x_new + ((state.t - 1.0) / t_new) * (x_new - state.x)
    else:
        t_new, y_new = state.t, x_new
    return state._replace(t=t_new, x=x_new, y=y_new, it=state.it + 1)


@partial(jax.jit, static_argnames=("cfg", "steps"))
def fb_run(F, g, state, cfg: FBCfg, steps: int):
    def body(s, _):
        with jax.named_scope("fb_step"):
            return _fb_step(F, g, cfg, s), None

    return jax.lax.scan(body, state, None, length=steps)[0]


@partial(jax.jit, static_argnames=("cfg",))
def fb_step(F, g, state, cfg: FBCfg):
    return _fb_step(F, g, cfg, state)


@dataclasses.dataclass(frozen=True)
class ForwardBackward:
    """Proximal-gradient facade (deterministic baseline). ``fast=True``
    is FISTA; ``maxit`` counts full-gradient steps."""

    gamma: Optional[float] = None
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100
    fast: bool = False
    fused_precision: str = "highest"  # "default" = bf16-mul/f32-acc MXU dots

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0
        assert self.fused_precision in ("highest", "default")

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
                    "ForwardBackward: provide the smoothness moduli L, "
                    "or a stepsize γ"
                )
            gamma = 1.0 / jnp.mean(jnp.asarray(L, rdt))
        fused = False
        if x0.dtype == jnp.float32:
            from ciao_tpu.ops.fused_block import _pick_tile

            fused = (
                runtime.on_tpu()
                and x0.size % 128 == 0
                and _pick_tile(N, N, x0.size) >= 128
                and hasattr(F, "coeff_rows_data")
                and getattr(F, "supports_coeff", False)
            )
        cfg = FBCfg(N=N, fast=self.fast, fused=fused,
                    fused_precision=self.fused_precision)
        init = lambda: fb_init(F, g, x0, gamma, cfg)
        return x0, F, g, cfg, init

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)

        def run_chunk(state, k):
            return fb_run(F, g, state, cfg, k)

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
        step = lambda s: fb_step(F, g, s, cfg)
        # stateless in the oracle: every step recomputes the full
        # gradient, so a storage switch self-heals (rebase identity)
        return SolverIterable(x0_orig, init, step, rebase_fn=lambda s: s)


def FISTA(**kwargs) -> ForwardBackward:
    """Accelerated forward-backward (``ForwardBackward(fast=True)``) —
    the FastForwardBackward of ProximalAlgorithms.jl."""
    return ForwardBackward(fast=True, **kwargs)
