"""SAGA / SAG solver family.

Re-design of reference ``src/algorithms/SAGA_SAG/SAGA_basic.jl``:
the per-index gradient table s_i = ∇f_i lives as one (N, n) HBM-resident
array; one step = uniform index draw, one component gradient, the
(biased for SAG / unbiased for SAGA) direction, prox, table row update.

Defaults (SAGA_basic.jl:34-35): γ = 1/(3 L_max) for SAGA,
1/(16 L_max) for SAG. Init (SAGA_basic.jl:41-48): table = gradients at
x0, av = mean, z = prox_g((1-γ) x0, γ).

Update-order quirk preserved (SAGA_basic.jl:57-62): SAG refreshes the
running average BEFORE forming the direction (biased estimator); SAGA
forms the unbiased direction first, then refreshes the average.

Beyond the reference (its TODO at SAGA_basic.jl:74): ``batch > 1``
draws a without-replacement minibatch and applies the averaged update —
the standard minibatch-SAGA estimator — keeping per-chip MXU utilization
high at scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ciao_tpu.prox import Zero
from ciao_tpu.solvers.base import (
    SolverIterable,
    Status,
    real_dtype_of,
    run_solver_loop,
)


class SAGACfg(NamedTuple):
    N: int
    sag: bool
    batch: int = 1


class SAGAState(NamedTuple):
    s: jnp.ndarray          # (N, n) gradient table
    gamma: jnp.ndarray      # scalar
    av: jnp.ndarray         # (n,) running average of the table
    z: jnp.ndarray          # (n,)
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):  # reference: solution(state) = state.z
        return self.z


@partial(jax.jit, static_argnames=("cfg",))
def saga_init(F, g, x0, gamma, key, cfg: SAGACfg) -> SAGAState:
    s = F.grad_all(x0)
    av = jnp.mean(s, axis=0)
    z = g.prox_only((1 - gamma) * x0, gamma)
    return SAGAState(
        s=s, gamma=gamma, av=av, z=z, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _saga_step(F, g, cfg: SAGACfg, state: SAGAState) -> SAGAState:
    N, B = cfg.N, cfg.batch
    key, sub = jax.random.split(state.key)
    if B == 1:
        idx = jax.random.randint(sub, (1,), 0, N, dtype=jnp.int32)
    else:
        idx = jax.random.choice(sub, N, (B,), replace=False).astype(jnp.int32)
    G_B = F.grad_batch(state.z, idx)          # (B, n) grads at z
    s_old = state.s[idx]
    diff = jnp.mean(G_B - s_old, axis=0)      # minibatch-averaged innovation
    if cfg.sag:
        av = state.av + diff * (B / N)
        w = state.z - state.gamma * av
    else:
        w = state.z - state.gamma * (diff + state.av)
        av = state.av + diff * (B / N)
    z = g.prox_only(w, state.gamma)
    s = state.s.at[idx].set(G_B)
    return state._replace(s=s, av=av, z=z, key=key, it=state.it + 1)


@partial(jax.jit, static_argnames=("cfg", "steps"))
def saga_run(F, g, state, cfg: SAGACfg, steps: int):
    def body(s, _):
        return _saga_step(F, g, cfg, s), None

    return jax.lax.scan(body, state, None, length=steps)[0]


@partial(jax.jit, static_argnames=("cfg",))
def saga_step(F, g, state, cfg: SAGACfg):
    return _saga_step(F, g, cfg, state)


@dataclasses.dataclass(frozen=True)
class SAGA:
    """SAGA facade (reference ``SAGA.jl:24-42``). ``SAG_flag`` switches to
    the biased SAG update (reference ``SAGA.jl:190-191``)."""

    gamma: Optional[float] = None
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    SAG_flag: bool = False
    batch: int = 1
    seed: int = 0

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0
        assert self.freq > 0
        assert self.batch >= 1

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
                raise ValueError("SAGA: smoothness parameter absent — provide L or γ")
            L_max = jnp.max(jnp.asarray(L, rdt))
            gamma = 1.0 / ((16.0 if self.SAG_flag else 3.0) * L_max)
        cfg = SAGACfg(N=N, sag=self.SAG_flag, batch=self.batch)
        key = jax.random.PRNGKey(self.seed)
        init = lambda: saga_init(F, g, x0, gamma, key, cfg)
        return x0, F, g, cfg, init

    def __call__(self, x0, F=None, g=None, L=None, N=None):
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)

        def run_chunk(state, n):
            return saga_run(F, g, state, cfg, n)

        def disp(it, state):
            print(f"{it:5d} | {float(state.gamma):.3e}")

        state, it = run_solver_loop(
            init, run_chunk, self.maxit, self.verbose, self.freq, disp
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)
        step = lambda s: saga_step(F, g, s, cfg)
        return SolverIterable(x0_orig, init, step)


def SAG(**kwargs):
    """SAG = SAGA with the biased update order (reference SAGA.jl:190-191)."""
    return SAGA(SAG_flag=True, **kwargs)
