"""Tensor-parallel (coordinate-sharded) solver path over a 2-D mesh.

SURVEY.md §2.3: the reference has no TP (its test problems have n≤5);
for very large n the coordinate dimension of x is the second natural
partition axis. This module implements coefficient-mode SAGA/SAG on a
("data", "model") mesh:

  * oracle rows shard over BOTH axes: A is (N, n) → P("data", "model");
  * the iterate z, average av, and the prox shard by coordinate over
    "model" (separable proxes only — coordinatewise, no collective);
  * the (N,) coefficient table shards over "data" (replicated across
    each data row's model group);
  * per step the ONLY collectives are a (B,)-sized psum of the partial
    row products over "model" (the margin r = A_B·x) and an x-shard-
    sized psum of the innovation over "data".

Combined DP×TP: data-axis size D shards the samples, model-axis size M
shards the coordinates; D=1 gives pure TP, M=1 degenerates to the
:mod:`dp` layout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ciao_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from ciao_tpu.prox import Zero
from ciao_tpu.solvers.base import (
    SolverIterable,
    real_dtype_of,
    run_solver_loop,
)


class TPCfg(NamedTuple):
    N: int
    D: int          # data-axis size
    M: int          # model-axis size
    b_loc: int      # per-data-row block size
    sag: bool = False

    @property
    def n_loc(self):
        return self.N // self.D


class TPSAGAState(NamedTuple):
    s: jnp.ndarray          # (N,) coefficient table, sharded P("data")
    gamma: jnp.ndarray      # scalar
    av: jnp.ndarray         # (n,) sharded P("model")
    z: jnp.ndarray          # (n,) sharded P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.z


def _psum_d(x):
    return jax.lax.psum(x, DATA_AXIS)


def _psum_m(x):
    return jax.lax.psum(x, MODEL_AXIS)


def data_model_specs(F, N: int):
    """Placement for 2-D sharding: stacked 2-D leaves (N, n) shard over
    both axes; stacked 1-D leaves (N,) over "data"; the rest replicate."""

    def spec(leaf):
        shape = getattr(leaf, "shape", None) or np.shape(leaf)
        if len(shape) == 2 and shape[0] == N:
            return P(DATA_AXIS, MODEL_AXIS)
        if len(shape) == 1 and shape[0] == N:
            return P(DATA_AXIS)
        return P()

    return jax.tree_util.tree_map(spec, F)


def shard_finite_sum_2d(F, mesh, N: Optional[int] = None):
    if N is None:
        N = F.num_terms
    specs = data_model_specs(F, N)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)), F, specs
    )


def _tp_saga_init(F, g, x0, gamma, key, cfg: TPCfg):
    """Coefficient bootstrap with column-partial margins: r = A x0 is a
    "model" psum; av = Σ c_i a_i / N is a "data" psum of local columns."""
    r = _psum_m(F.margin_all(x0))            # (n_loc_rows,) replicated in row
    c = F.coeff_from_margin_all(r)
    av = _psum_d(F.apply_all(c)) / cfg.N     # local model columns
    z = g.prox_only((1 - gamma) * x0, gamma)
    return TPSAGAState(
        s=c, gamma=gamma, av=av, z=z, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_saga_step(F, g, cfg: TPCfg, state: TPSAGAState):
    """One block step: margin psum over "model" (B floats), innovation
    psum over "data" (n/M floats per device) — the entire cross-device
    traffic."""
    N, B = cfg.N, cfg.b_loc
    key, sub = jax.random.split(state.key)
    # all model-group members of a data row must pick the SAME block
    row = jax.lax.axis_index(DATA_AXIS)
    k = jax.random.fold_in(sub, row)
    j = jax.random.randint(k, (), 0, cfg.n_loc // B, dtype=jnp.int32)
    start = j * B
    r = _psum_m(F.margin_block(state.z, start, B))
    c_new = F.coeff_from_margin(r, start, B)
    c_old = jax.lax.dynamic_slice_in_dim(state.s, start, B)
    innov = _psum_d(F.apply_rows_block(c_new - c_old, start, B))
    B_glob = B * cfg.D
    diff = innov / B_glob
    if cfg.sag:
        av = state.av + innov / N
        w = state.z - state.gamma * av
    else:
        w = state.z - state.gamma * (diff + state.av)
        av = state.av + innov / N
    z = g.prox_only(w, state.gamma)          # separable: local coordinates
    s = jax.lax.dynamic_update_slice_in_dim(state.s, c_new, start, 0)
    return state._replace(s=s, av=av, z=z, key=key, it=state.it + 1)


_ST_SPECS = TPSAGAState(
    s=P(DATA_AXIS), gamma=P(), av=P(MODEL_AXIS), z=P(MODEL_AXIS),
    key=P(), it=P(), status=P(),
)


@functools.lru_cache(maxsize=32)
def _compiled_tp(mesh, f_treedef, f_specs_leaves, g_treedef, cfg: TPCfg):
    f_specs = jax.tree_util.tree_unflatten(f_treedef, list(f_specs_leaves))
    g_specs = jax.tree_util.tree_unflatten(
        g_treedef, [P()] * g_treedef.num_leaves
    )

    def init_body(F, g, x0, gamma, key):
        return _tp_saga_init(F, g, x0, gamma, key, cfg)

    init_fn = jax.jit(jax.shard_map(
        init_body, mesh=mesh,
        in_specs=(f_specs, g_specs, P(MODEL_AXIS), P(), P()),
        out_specs=_ST_SPECS, check_vma=False,
    ))

    def step_body(F, g, state):
        return _tp_saga_step(F, g, cfg, state)

    step_fn = jax.jit(jax.shard_map(
        step_body, mesh=mesh,
        in_specs=(f_specs, g_specs, _ST_SPECS),
        out_specs=_ST_SPECS, check_vma=False,
    ))

    def run_body(F, g, state, steps):
        def body(s, _):
            return _tp_saga_step(F, g, cfg, s), None

        return jax.lax.scan(body, state, None, length=steps)[0]

    run_fn = jax.jit(
        lambda F, g, state, steps: jax.shard_map(
            functools.partial(run_body, steps=steps), mesh=mesh,
            in_specs=(f_specs, g_specs, _ST_SPECS),
            out_specs=_ST_SPECS, check_vma=False,
        )(F, g, state),
        static_argnames=("steps",),
    )
    return init_fn, step_fn, run_fn


@dataclasses.dataclass(frozen=True)
class TPSAGA:
    """Coefficient-mode SAGA/SAG on a ("data", "model") mesh — samples
    AND coordinates sharded. Requires a rank-1 oracle and a separable
    prox; ``batch`` is the per-data-row contiguous block size."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    SAG_flag: bool = False
    seed: int = 0

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError("TPSAGA needs a ('data','model') mesh (make_mesh_2d)")
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPSAGA shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPSAGA needs a rank-1 (coefficient) oracle")
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError("TPSAGA: need N divisible by D and N/D by batch")
        if x0.size % M != 0:
            raise ValueError("TPSAGA: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        else:
            if L is None:
                raise ValueError("TPSAGA: provide L or γ")
            L_max = jnp.max(jnp.asarray(L, rdt))
            gamma = 1.0 / ((16.0 if self.SAG_flag else 3.0) * L_max)
        cfg = TPCfg(N=N, D=D, M=M, b_loc=self.batch, sag=self.SAG_flag)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_treedef = jax.tree_util.tree_structure(g)
        init_c, step_c, run_c = _compiled_tp(
            mesh, f_treedef, tuple(leaves), g_treedef, cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        return x0, F, g, init, step, run

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(init, run, self.maxit, self.verbose, self.freq, disp, observe)
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step)
