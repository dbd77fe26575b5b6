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
    resolve_gamma_array,
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


def model_prox_specs(g, n: int):
    """Placement for the prox's pytree under coordinate sharding:
    coordinate-length (n,) parameter leaves (per-coordinate box bounds,
    weights) shard over "model" alongside the iterate; scalars and
    everything else replicate. Without this a vector prox parameter
    stays full-length inside the shard and broadcasts the local
    (n/M,)-iterate back to (n,)."""

    def spec(leaf):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            shape = np.shape(leaf)
        return P(MODEL_AXIS) if len(shape) == 1 and shape[0] == n else P()

    return jax.tree_util.tree_map(spec, g)


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


def _tp_saga_rebase(F, g, cfg: TPCfg, state: TPSAGAState):
    """2-D mirror of ``solvers.saga.saga_rebase``: after an oracle
    row-storage swap the delta-maintained ``av`` keeps the old
    operator's bias forever — recompute the local model-column partials
    from the coefficient shards and psum over "data"."""
    return state._replace(av=_psum_d(F.apply_all(state.s)) / cfg.N)


# ---------------------------------------------------------------------------
# tensor-parallel Finito (coefficient mode)
# ---------------------------------------------------------------------------

class TPFinitoState(NamedTuple):
    """Coefficient-mode Finito sharded over ("data", "model"): the (N,)
    coefficients/stepsizes by sample, the per-block anchors by BOTH
    axes, the iterate/average/prox by coordinate."""

    c: jnp.ndarray          # (N,) coefficient table, P("data")
    zb: jnp.ndarray         # (D·d_loc, n) per-block anchors, P("data","model")
    invg: jnp.ndarray       # (D·d_loc,) Σ 1/γ_i per block, P("data")
    hat_gamma: jnp.ndarray  # scalar (harmonic over ALL N)
    av: jnp.ndarray         # (n,) P("model")
    z: jnp.ndarray          # (n,) P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.z


class TPFinitoCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    sweeping: int

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_finito_init(F, g, x0, gamma, key, cfg: TPFinitoCfg):
    """2-D-sharded coefficient-Finito bootstrap (cf.
    parallel.dp._finito_coeff_init_local, plus the "model" margin psum;
    hat_γ·Σ(1/γ) = 1 simplifies av to x0 − (hat/N)·Σ cᵢaᵢ)."""
    n_loc, N, B = cfg.n_loc, cfg.N, cfg.b_loc
    d_loc = n_loc // B
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    inv_gamma = 1.0 / gamma
    hat_gamma = 1.0 / _psum_d(jnp.sum(inv_gamma))
    av = x0 - (hat_gamma / N) * _psum_d(F.apply_all(c))
    z = g.prox_only(av, hat_gamma)
    invg = jnp.sum(inv_gamma.reshape(d_loc, B), axis=1)
    zb = jnp.broadcast_to(x0, (d_loc,) + x0.shape)
    return TPFinitoState(
        c=c, zb=zb, invg=invg, hat_gamma=hat_gamma, av=av, z=z, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_finito_step(F, g, cfg: TPFinitoCfg, state: TPFinitoState):
    """One block step. Collectives: a (B,)-sized margin psum over
    "model" and one x-shard-sized psum over "data" of the combined
    anchor + coefficient innovation (cf. dp._finito_coeff_step_local)."""
    N, B = cfg.N, cfg.b_loc
    hat = state.hat_gamma
    from ciao_tpu.parallel.dp import local_block_start

    start = local_block_start(state.key, state.it, cfg.n_loc, B, cfg.sweeping)
    j = start // B
    r = _psum_m(F.margin_block(state.z, start, B))
    c_new = F.coeff_from_margin(r, start, B)
    c_old = jax.lax.dynamic_slice_in_dim(state.c, start, B)
    z_b = state.zb[j]
    innov = _psum_d(
        hat * state.invg[j] * (state.z - z_b)
        - (hat / N) * F.apply_rows_block(c_new - c_old, start, B)
    )
    av = state.av + innov
    c = jax.lax.dynamic_update_slice_in_dim(state.c, c_new, start, 0)
    zb = state.zb.at[j].set(state.z)
    z = g.prox_only(av, hat)          # separable: local coordinates
    return state._replace(c=c, zb=zb, av=av, z=z, it=state.it + 1)


def _tp_finito_rebase(F, g, cfg: TPFinitoCfg, state: TPFinitoState):
    """2-D mirror of ``solvers.finito.finito_rebase``:
    av = hat_γ·Σ(invg_j·zb_j − c_i·a_i/N) — local (data-row, model-col)
    partials psum'd over "data"; z re-proxed on local coordinates."""
    hat = state.hat_gamma
    av = hat * _psum_d(state.invg @ state.zb - F.apply_all(state.c) / cfg.N)
    return state._replace(av=av, z=g.prox_only(av, hat))


_FIN_ST_SPECS = TPFinitoState(
    c=P(DATA_AXIS), zb=P(DATA_AXIS, MODEL_AXIS), invg=P(DATA_AXIS),
    hat_gamma=P(), av=P(MODEL_AXIS), z=P(MODEL_AXIS),
    key=P(), it=P(), status=P(),
)


@dataclasses.dataclass(frozen=True)
class TPFinito:
    """Coefficient-mode Finito/MISO on a ("data", "model") mesh —
    samples AND coordinates sharded (reference Finito_basic.jl re-laid
    for 2-D sharding; the reference itself is single-process). Requires
    a rank-1 oracle and a separable prox; ``batch`` is the per-data-row
    contiguous block size; sweeping ∈ {1 random, 2 cyclic, 3 shuffled}
    runs per data row over its local blocks."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    sweeping: int = 1
    alpha: float = 0.999
    maxit: int = 10000
    verbose: bool = False
    freq: int = 10000
    seed: int = 0

    def _setup(self, x0, F, g, L, N):
        from ciao_tpu.solvers.base import resolve_gamma_array

        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPFinito needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPFinito shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPFinito needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPFinito shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
        if self.sweeping not in (1, 2, 3):
            raise ValueError(f"sweeping must be 1, 2 or 3; got {self.sweeping}")
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError("TPFinito: need N divisible by D and N/D by batch")
        if x0.size % M != 0:
            raise ValueError("TPFinito: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        gamma = resolve_gamma_array(self.gamma, L, N, self.alpha, rdt)
        cfg = TPFinitoCfg(N=N, D=D, M=M, b_loc=self.batch,
                          sweeping=self.sweeping)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "finito", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.hat_gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


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
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPSAGA shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
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
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "saga", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(init, run, self.maxit, self.verbose, self.freq, disp, observe)
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


# ---------------------------------------------------------------------------
# tensor-parallel LFinito (low-memory epoch sweeps, coefficient anchor)
# ---------------------------------------------------------------------------

class TPLFinitoState(NamedTuple):
    """O(n)-memory LFinito sharded over ("data", "model"): per-index
    stepsizes by sample, the iterate/average/anchor by coordinate —
    no table (reference Finito_LFinito.jl re-laid for 2-D sharding)."""

    gamma: jnp.ndarray      # (N,) P("data")
    hat_gamma: jnp.ndarray  # scalar (harmonic over ALL N)
    av: jnp.ndarray         # (n,) P("model")
    z: jnp.ndarray          # (n,) P("model")
    z_full: jnp.ndarray     # (n,) P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.z


class TPLFinitoCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    sweeping: int

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_lfinito_init(F, g, x0, gamma, key, cfg: TPLFinitoCfg):
    """2-D-sharded LFinito bootstrap (reference Finito_LFinito.jl:39-74;
    cf. dp._lfinito_init_local plus the "model" margin psum). The init
    z is a copy of av (no prox) — the reference quirk."""
    hat_gamma = 1.0 / _psum_d(jnp.sum(1.0 / gamma))
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    av = x0 - (hat_gamma / cfg.N) * _psum_d(F.apply_all(c))
    return TPLFinitoState(
        gamma=gamma, hat_gamma=hat_gamma, av=av, z=av, z_full=av, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_lfinito_epoch(F, g, cfg: TPLFinitoCfg, state: TPLFinitoState):
    """One lockstep LFinito epoch (reference Finito_LFinito.jl:77-103;
    cf. dp._lfinito_step_local): anchor refresh (one "model" margin
    psum + one "data" psum), then a block sweep where each data row
    visits its own blocks — per block one (B,)-sized margin psum over
    "model" and one x-shard-sized psum over "data" of the combined
    innovation. The inner (z − z_full) term carries each row's local
    Σ 1/γ; the data psum sums those scalars into the global one."""
    from ciao_tpu.sampling import Sweep

    N, B = cfg.N, cfg.b_loc
    d_loc = cfg.n_loc // B
    hat = state.hat_gamma
    row = jax.lax.axis_index(DATA_AXIS)

    z_full = g.prox_only(state.av, hat)
    rf = _psum_m(F.margin_all(z_full))
    cf = F.coeff_from_margin_all(rf)          # (n_loc,) anchor coefficients
    av = z_full - (hat / N) * _psum_d(F.apply_all(cf))

    if cfg.sweeping == Sweep.SHUFFLED:
        ke = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
        order = jax.random.permutation(ke, d_loc).astype(jnp.int32)
    else:
        order = jnp.arange(d_loc, dtype=jnp.int32)

    def block_body(carry, j):
        av, z = carry
        z = g.prox_only(av, hat)
        start = j * B
        r = _psum_m(F.margin_block(z, start, B))
        cb = F.coeff_from_margin(r, start, B)
        cfb = jax.lax.dynamic_slice_in_dim(cf, start, B)
        inv_g = jnp.sum(
            1.0 / jax.lax.dynamic_slice_in_dim(state.gamma, start, B)
        )
        av = av + _psum_d(
            (hat / N) * F.apply_rows_block(cfb - cb, start, B)
            + hat * inv_g * (z - z_full)
        )
        return (av, z), None

    (av, z), _ = jax.lax.scan(block_body, (av, state.z), order)
    return state._replace(av=av, z=z, z_full=z_full, it=state.it + 1)


_LFIN_ST_SPECS = TPLFinitoState(
    gamma=P(DATA_AXIS), hat_gamma=P(), av=P(MODEL_AXIS), z=P(MODEL_AXIS),
    z_full=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


@dataclasses.dataclass(frozen=True)
class TPLFinito:
    """O(n)-memory LFinito on a ("data", "model") mesh — samples AND
    coordinates sharded, no table (the low-memory variant for huge N
    AND huge n at once). Requires a rank-1 oracle and a separable prox;
    ``batch`` is the per-data-row contiguous block size; one iterate =
    one epoch (reference Finito_LFinito.jl granularity)."""

    mesh: object = None
    gamma: Optional[object] = None
    batch: int = 1
    sweeping: int = 1
    alpha: float = 0.999
    maxit: int = 10000
    verbose: bool = False
    freq: int = 10000
    seed: int = 0

    def _setup(self, x0, F, g, L, N):
        from ciao_tpu.solvers.base import resolve_gamma_array

        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPLFinito needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPLFinito shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPLFinito needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPLFinito shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
        if self.sweeping not in (1, 2, 3):
            raise ValueError(f"sweeping must be 1, 2 or 3; got {self.sweeping}")
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError("TPLFinito: need N divisible by D and N/D by batch")
        if x0.size % M != 0:
            raise ValueError("TPLFinito: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        gamma = resolve_gamma_array(self.gamma, L, N, self.alpha, rdt)
        cfg = TPLFinitoCfg(N=N, D=D, M=M, b_loc=self.batch,
                           sweeping=self.sweeping)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "lfinito", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.hat_gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


# ---------------------------------------------------------------------------
# tensor-parallel SVRG/SVRG++ (coefficient anchor, no table)
# ---------------------------------------------------------------------------

class TPSVRGState(NamedTuple):
    gamma: jnp.ndarray      # scalar
    m: jnp.ndarray          # inner-loop length (doubles under plus)
    av: jnp.ndarray         # (n,) anchor mean, P("model")
    z: jnp.ndarray          # (n,) running inner sum, P("model")
    z_full: jnp.ndarray     # (n,) outer iterate, P("model")
    w: jnp.ndarray          # (n,) inner iterate, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.z_full


class TPSVRGCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    plus: bool = False

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_svrg_init(F, g, x0, gamma, m, key, cfg: TPSVRGCfg):
    """2-D-sharded SVRG bootstrap (reference SVRG_basic.jl:58-67): the
    anchor full gradient is one "model" margin psum + one "data" psum."""
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    av = _psum_d(F.apply_all(c)) / cfg.N
    return TPSVRGState(
        gamma=gamma, m=jnp.asarray(m, jnp.int32), av=av,
        z=jnp.zeros_like(x0), z_full=x0, w=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_svrg_outer(F, g, cfg: TPSVRGCfg, state: TPSVRGState):
    """One SVRG outer iterate (reference SVRG_basic.jl:71-96; cf.
    dp._svrg_step_local): the anchor coefficients are recomputed ONCE
    per outer step (z_full is fixed during the inner loop), so each
    inner step pays one (B,)-sized "model" margin psum at w and one
    x-shard-sized "data" psum of the variance-reduced direction —
    distributed minibatch SVRG with global inner batch B·D (each data
    row draws its own block)."""
    N, B = cfg.N, cfg.b_loc
    gamma, av = state.gamma, state.av
    row = jax.lax.axis_index(DATA_AXIS)
    kstep = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
    d_loc = cfg.n_loc // B

    rf = _psum_m(F.margin_all(state.z_full))
    cf = F.coeff_from_margin_all(rf)          # (n_loc,) anchor coefficients

    def inner(k, carry):
        w, zsum = carry
        kk = jax.random.fold_in(kstep, k)
        start = jax.random.randint(kk, (), 0, d_loc, dtype=jnp.int32) * B
        rw = _psum_m(F.margin_block(w, start, B))
        cb = F.coeff_from_margin(rw, start, B)
        cfb = jax.lax.dynamic_slice_in_dim(cf, start, B)
        d = _psum_d(F.apply_rows_block(cfb - cb, start, B)) / (B * cfg.D)
        w = g.prox_only(w + gamma * (d - av), gamma)
        return w, zsum + w

    w, zsum = jax.lax.fori_loop(0, state.m, inner, (state.w, state.z))
    z_full = zsum / state.m.astype(
        jnp.zeros((), jnp.result_type(zsum)).real.dtype
    )
    w_next = w if cfg.plus else z_full
    rf2 = _psum_m(F.margin_all(z_full))
    av_next = _psum_d(F.apply_all(F.coeff_from_margin_all(rf2))) / N
    m_next = state.m * 2 if cfg.plus else state.m
    return state._replace(
        m=m_next, av=av_next, z=jnp.zeros_like(zsum), z_full=z_full,
        w=w_next, it=state.it + 1,
    )


_SVRG_ST_SPECS = TPSVRGState(
    gamma=P(), m=P(), av=P(MODEL_AXIS), z=P(MODEL_AXIS),
    z_full=P(MODEL_AXIS), w=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


class TPKatyushaState(NamedTuple):
    Lmax: jnp.ndarray       # scalar smoothness bound (drives α, β)
    tau1: jnp.ndarray       # scalar momentum weight of the CURRENT epoch
    tau2: jnp.ndarray       # scalar anchor weight (constant)
    av: jnp.ndarray         # (n,) anchor μ = ∇f(x̃), P("model")
    x_tilde: jnp.ndarray    # (n,) outer iterate, P("model")
    y: jnp.ndarray          # (n,) gradient-step sequence, P("model")
    z: jnp.ndarray          # (n,) mirror-step sequence, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x_tilde


class TPKatyushaCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    m: int = 1          # inner steps per outer iterate (static)
    ns: bool = False    # non-strongly-convex τ₁ₛ = 2/(s+4) schedule

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_katyusha_init(F, g, x0, Lmax, tau1, tau2, key, cfg: TPKatyushaCfg):
    """2-D-sharded Katyusha bootstrap (cf. dp._katyusha_init_local): the
    anchor full gradient is one "model" margin psum + one "data" psum."""
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    av = _psum_d(F.apply_all(c)) / cfg.N
    return TPKatyushaState(
        Lmax=Lmax, tau1=tau1, tau2=tau2, av=av, x_tilde=x0, y=x0, z=x0,
        key=key, it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_katyusha_outer(F, g, cfg: TPKatyushaCfg, state: TPKatyushaState):
    """One Katyusha outer iterate on the ("data","model") mesh (the
    three-sequence coupling of solvers.katyusha on the TPSVRG data
    path). The anchor coefficients are recomputed ONCE per outer step;
    each inner step pays one (B,)-sized "model" margin psum at x and
    one x-shard-sized "data" psum of the variance-reduced direction —
    every vector update is coordinate-local (separable prox)."""
    N, B, m = cfg.N, cfg.b_loc, cfg.m
    rdt = jnp.zeros((), jnp.result_type(state.y)).real.dtype
    s = (state.it - 1).astype(rdt)
    tau1 = 2.0 / (s + 4.0) if cfg.ns else state.tau1
    tau2 = state.tau2
    alpha = 1.0 / (3.0 * tau1 * state.Lmax)
    beta = 1.0 / (3.0 * state.Lmax)
    av, xt = state.av, state.x_tilde
    row = jax.lax.axis_index(DATA_AXIS)
    kstep = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
    d_loc = cfg.n_loc // B

    rf = _psum_m(F.margin_all(xt))
    cf = F.coeff_from_margin_all(rf)          # (n_loc,) anchor coefficients

    def inner(carry, k):
        y, z, ysum = carry
        x = tau1 * z + tau2 * xt + (1.0 - tau1 - tau2) * y
        kk = jax.random.fold_in(kstep, k)
        start = jax.random.randint(kk, (), 0, d_loc, dtype=jnp.int32) * B
        rx = _psum_m(F.margin_block(x, start, B))
        cb = F.coeff_from_margin(rx, start, B)
        cfb = jax.lax.dynamic_slice_in_dim(cf, start, B)
        # ∇̃ = μ + mean over the global B·D inner batch of (live − anchor)
        gr = av + _psum_d(F.apply_rows_block(cb - cfb, start, B)) / (B * cfg.D)
        z = g.prox_only(z - alpha * gr, alpha)
        y = g.prox_only(x - beta * gr, beta)
        return (y, z, ysum + y), None

    (y, z, ysum), _ = jax.lax.scan(
        inner, (state.y, state.z, jnp.zeros_like(state.y)),
        jnp.arange(m, dtype=jnp.int32),
    )
    x_tilde = ysum / jnp.asarray(m, ysum.dtype)
    rf2 = _psum_m(F.margin_all(x_tilde))
    av_next = _psum_d(F.apply_all(F.coeff_from_margin_all(rf2))) / N
    return state._replace(
        tau1=tau1.astype(state.tau1.dtype) if cfg.ns else state.tau1,
        av=av_next, x_tilde=x_tilde, y=y, z=z, it=state.it + 1,
    )


_KAT_ST_SPECS = TPKatyushaState(
    Lmax=P(), tau1=P(), tau2=P(), av=P(MODEL_AXIS), x_tilde=P(MODEL_AXIS),
    y=P(MODEL_AXIS), z=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


class TPSARAHState(NamedTuple):
    gamma: jnp.ndarray      # scalar stepsize
    eta: jnp.ndarray        # scalar ProxSARAH damping
    x_tilde: jnp.ndarray    # (n,) outer iterate, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x_tilde


class TPSARAHCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    m: int = 1          # inner steps per outer iterate (static)

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_sarah_init(F, g, x0, gamma, eta, key, cfg: TPSARAHCfg):
    """2-D-sharded SARAH bootstrap (cf. dp._sarah_init_local): no
    gradient work at init — the full-pass v₀ belongs to the outer
    step, so solution(init) == x0."""
    return TPSARAHState(
        gamma=gamma, eta=eta, x_tilde=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_sarah_outer(F, g, cfg: TPSARAHCfg, state: TPSARAHState):
    """One SARAH outer iterate on the ("data","model") mesh (the
    recursive estimator of solvers.sarah on the TPSVRG data path).
    Unlike SVRG/Katyusha the estimator's reference point MOVES every
    inner step, so each step needs the block margins at BOTH w_t and
    w_{t−1} — stacked into ONE (2,B)-sized "model" psum — followed by
    one x-shard-sized "data" psum of the innovation. The damped prox is
    coordinate-local (separable g)."""
    from ciao_tpu.solvers.sarah import _damped_prox

    N, B, m = cfg.N, cfg.b_loc, cfg.m
    gamma, eta = state.gamma, state.eta
    row = jax.lax.axis_index(DATA_AXIS)
    kstep = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
    d_loc = cfg.n_loc // B

    rf = _psum_m(F.margin_all(state.x_tilde))
    v0 = _psum_d(F.apply_all(F.coeff_from_margin_all(rf))) / N
    w_prev = state.x_tilde
    w = _damped_prox(g, w_prev, v0, gamma, eta)

    def inner(carry, k):
        w_prev, w, v = carry
        kk = jax.random.fold_in(kstep, k)
        start = jax.random.randint(kk, (), 0, d_loc, dtype=jnp.int32) * B
        r2 = _psum_m(jnp.stack([
            F.margin_block(w, start, B),
            F.margin_block(w_prev, start, B),
        ]))
        cb = F.coeff_from_margin(r2[0], start, B)
        cp = F.coeff_from_margin(r2[1], start, B)
        v = v + _psum_d(F.apply_rows_block(cb - cp, start, B)) / (B * cfg.D)
        w_next = _damped_prox(g, w, v, gamma, eta)
        return (w, w_next, v), None

    (_, w, _), _ = jax.lax.scan(
        inner, (w_prev, w, v0), jnp.arange(m, dtype=jnp.int32)
    )
    return state._replace(x_tilde=w, it=state.it + 1)


_SARAH_ST_SPECS = TPSARAHState(
    gamma=P(), eta=P(), x_tilde=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


class TPPointSAGAState(NamedTuple):
    gamma: jnp.ndarray   # scalar stepsize
    c: jnp.ndarray       # (N,) prox-coefficient table, P("data")
    av: jnp.ndarray      # (n,) table mean, P("model")
    x: jnp.ndarray       # (n,) iterate, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


class TPPointSAGACfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    sweeping: int = 1

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_point_saga_init(F, g, x0, gamma, key, cfg: TPPointSAGACfg):
    """2-D-sharded Point-SAGA bootstrap (cf. dp._point_saga_init_local):
    coefficient shard from one "model" margin psum, table mean from one
    "data" psum."""
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    av = _psum_d(F.apply_all(c)) / cfg.N
    return TPPointSAGAState(
        gamma=gamma, c=c, av=av, x=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_point_saga_step(F, g, cfg: TPPointSAGACfg, state: TPPointSAGAState):
    """One Point-SAGA block step on the ("data","model") mesh. The
    per-row prox needs the block margins AND the full row square-norms
    at the shifted iterate — both partial over the coordinate shard, so
    they stack into ONE (2,B)-sized "model" psum; the θ solve then runs
    replicated within each model group, and the block contribution
    u = Σ(c−θ)·conj(a) is one x-shard-sized "data" psum (the same
    two-collective shape as every TP family)."""
    from ciao_tpu.parallel.dp import local_block_start

    N, B = cfg.N, cfg.b_loc
    gamma = state.gamma
    v = state.x - gamma * state.av
    start = local_block_start(state.key, state.it, cfg.n_loc, B,
                              cfg.sweeping)
    c_B = jax.lax.dynamic_slice_in_dim(state.c, start, B)
    mv_part = F.margin_block(v, start, B)
    na2_part = F.pointprox_sqnorm_block(start, B).astype(mv_part.dtype)
    r2 = _psum_m(jnp.stack([mv_part, na2_part]))
    theta = F.pointprox_theta_block(r2[0], jnp.real(r2[1]), c_B, gamma,
                                    start, B)
    c = jax.lax.dynamic_update_slice_in_dim(state.c, theta, start, 0)
    u = _psum_d(F.apply_rows_block(c_B - theta, start, B))
    x = v + (gamma / (B * cfg.D)) * u
    av = state.av - u / N
    return state._replace(c=c, av=av, x=x, it=state.it + 1)


def _tp_point_saga_rebase(F, g, cfg: TPPointSAGACfg, state: TPPointSAGAState):
    """Exact table-mean recompute (one apply + "data" psum) — required
    after an oracle storage swap."""
    return state._replace(av=_psum_d(F.apply_all(state.c)) / cfg.N)


_PS_ST_SPECS = TPPointSAGAState(
    gamma=P(), c=P(DATA_AXIS), av=P(MODEL_AXIS), x=P(MODEL_AXIS), key=P(),
    it=P(), status=P(),
)


class TPFBState(NamedTuple):
    gamma: jnp.ndarray   # scalar stepsize
    t: jnp.ndarray       # scalar Nesterov sequence
    x: jnp.ndarray       # (n,) iterate, P("model")
    y: jnp.ndarray       # (n,) extrapolated point, P("model")
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


class TPFBCfg(NamedTuple):
    N: int
    D: int
    M: int
    fast: bool = False
    polish_chunk: int = 0   # FB/FISTA: compensated chunked local gradient

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_fb_init(F, g, x0, gamma, cfg: TPFBCfg):
    rdt = jnp.zeros((), jnp.result_type(x0)).real.dtype
    return TPFBState(
        gamma=gamma, t=jnp.ones((), rdt), x=x0, y=x0,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_fb_grad_polish(F, y, cfg: TPFBCfg):
    """COMPENSATED 2-D-sharded full gradient (the TP face of
    solvers.polish.grad_sum_chunked — round 4): each (data, model)
    shard streams its row block in ``polish_chunk``-row chunks — one
    "model" margin psum per chunk — and carries the partial gradient
    shard with a two-sum compensation; the final "data" reduction psums
    the hi and lo carries SEPARATELY (D addends cost ~√D·eps, orders
    below the chunk carries they ride on). This is what lets the
    model-sharded deep_solve_tp polish below the monolithic-f32
    gradient floor."""
    from ciao_tpu.solvers.polish import _two_sum

    C = cfg.polish_chunk
    d = cfg.n_loc // C

    def body(carry, i):
        hi, lo = carry
        start = i * C
        m = _psum_m(F.margin_block(y, start, C))
        c = F.coeff_from_margin(m, start, C)
        p = F.apply_rows_block(c, start, C)
        return _two_sum(hi, lo, p), None

    z = jnp.zeros_like(y)
    (hi, lo), _ = jax.lax.scan(body, (z, z), jnp.arange(d))
    return (_psum_d(hi) + _psum_d(lo)) / cfg.N


def _tp_fb_step(F, g, cfg: TPFBCfg, state: TPFBState):
    """One 2-D-sharded ISTA/FISTA step: full-gradient margins psum over
    "model", the gradient shard psum over "data", prox + extrapolation
    coordinate-local (separable g). ``polish_chunk`` swaps in the
    compensated chunked gradient (deep-accuracy polish)."""
    gamma = state.gamma
    if cfg.polish_chunk:
        grad = _tp_fb_grad_polish(F, state.y, cfg)
    else:
        r = _psum_m(F.margin_all(state.y))
        grad = _psum_d(F.apply_all(F.coeff_from_margin_all(r))) / cfg.N
    x_new = g.prox_only(state.y - gamma * grad, gamma)
    if cfg.fast:
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * state.t * state.t))
        y_new = x_new + ((state.t - 1.0) / t_new) * (x_new - state.x)
    else:
        t_new, y_new = state.t, x_new
    return state._replace(t=t_new, x=x_new, y=y_new, it=state.it + 1)


_FB_ST_SPECS = TPFBState(
    gamma=P(), t=P(), x=P(MODEL_AXIS), y=P(MODEL_AXIS), it=P(), status=P(),
)


class TPDYSState(NamedTuple):
    gamma: jnp.ndarray   # scalar stepsize
    lam: jnp.ndarray     # scalar relaxation
    z: jnp.ndarray       # (n,) governing sequence, P("model")
    xg: jnp.ndarray      # (n,) last prox_g point — solution view
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.xg


def _tp_dys_init(F, gh, x0, gamma, lam, cfg: TPFBCfg):
    """2-D-sharded Davis-Yin bootstrap (solvers.dys — beyond the
    reference): table-free; the iterate pair shards over "model".
    ``gh`` packs the two proximable terms (g, h)."""
    return TPDYSState(
        gamma=gamma, lam=lam, z=x0, xg=x0,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_dys_step(F, gh, cfg: TPFBCfg, state: TPDYSState):
    """One 2-D-sharded Davis-Yin step: the full gradient at the prox
    point is the TPFB margin/gradient psum pair; both proxes and the
    z-algebra are coordinate-local (separable g, h). f = 0
    (TPDouglasRachford) skips the oracle entirely — ZeroOracle has no
    margin protocol."""
    from ciao_tpu.oracles import ZeroOracle

    g, h = gh
    gamma = state.gamma
    xg = g.prox_only(state.z, gamma)
    if isinstance(F, ZeroOracle):
        grad = jnp.zeros_like(xg)
    else:
        r = _psum_m(F.margin_all(xg))
        grad = _psum_d(F.apply_all(F.coeff_from_margin_all(r))) / cfg.N
    xh = h.prox_only(2.0 * xg - state.z - gamma * grad, gamma)
    z_new = state.z + state.lam * (xh - xg)
    return state._replace(z=z_new, xg=xg, it=state.it + 1)


_DYS_ST_SPECS = TPDYSState(
    gamma=P(), lam=P(), z=P(MODEL_AXIS), xg=P(MODEL_AXIS), it=P(),
    status=P(),
)


class TPPDCfg(NamedTuple):
    N: int
    D: int
    M: int
    kkind: str = "firstdiff"   # "identity" | "firstdiff" (stencil K)


class TPPDState(NamedTuple):
    tau: jnp.ndarray
    sigma: jnp.ndarray
    x: jnp.ndarray       # (n_loc,) primal shard — the solution view
    y: jnp.ndarray       # (n_loc,) dual shard, PADDED to n (see step)
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


def _tp_pd_init(F, gh, x0, tau, sigma, cfg: TPPDCfg):
    return TPPDState(
        tau=tau, sigma=sigma, x=x0, y=jnp.zeros_like(x0),
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_pd_step(F, gh, cfg: TPPDCfg, state: TPPDState):
    """One 2-D-sharded Condat-Vũ step with a HALO-EXCHANGE stencil K.

    Round 3 kept Condat-Vũ DP-only because a general K matvec mixes
    coordinates (a dense K under a coordinate shard needs an n-sized
    all-gather per step — still true, still DP-only). But the
    ANALYSIS-STENCIL case — K = FirstDifference, the total-variation /
    fused-lasso workhorse — touches only ADJACENT coordinates: each
    "model" shard needs exactly ONE scalar from each neighbor per
    apply, a single-element `lax.ppermute` riding the ICI ring. The
    dual y (globally (n−1,)) is carried PADDED to (n,) with the
    virtual last element pinned to 0, so it shards exactly like x:

        (Kx)_i  = x_{i+1} − x_i   (i < n−1; virtual row n−1 → 0)
        (Kᵀy)_j = y_{j−1} − y_j   (y_{−1} = y_{n−1} = 0)

    The gradient is the TPFB margin psum pair; both proxes are
    coordinate-local (separable g, h — the dual prox via the Moreau
    identity). f = 0 (TP Chambolle-Pock) skips the oracle. Trajectory
    ≡ single-chip to reduction order (pinned in test_primal_dual)."""
    from ciao_tpu.oracles import ZeroOracle
    from ciao_tpu.solvers.primal_dual import prox_conjugate

    g, h = gh
    tau, sigma = state.tau, state.sigma
    x, y = state.x, state.y
    M = cfg.M
    mi = jax.lax.axis_index(MODEL_AXIS)
    n_loc = x.shape[0]
    ring_fwd = [(i, (i + 1) % M) for i in range(M)]   # recv left's send
    ring_bwd = [(i, (i - 1) % M) for i in range(M)]   # recv right's send

    if isinstance(F, ZeroOracle):
        grad = jnp.zeros_like(x)
    else:
        r = _psum_m(F.margin_all(x))
        grad = _psum_d(F.apply_all(F.coeff_from_margin_all(r))) / cfg.N

    if cfg.kkind == "identity":
        kty = y
    else:
        # Kᵀy: left neighbor's LAST dual element (0 for the first shard)
        left_last = jax.lax.ppermute(y[-1:], MODEL_AXIS, ring_fwd)
        left_last = jnp.where(mi == 0, 0.0, left_last)
        kty = jnp.concatenate([left_last, y[:-1]]) - y
    x_new = g.prox_only(x - tau * (grad + kty), tau)

    v = 2.0 * x_new - x
    if cfg.kkind == "identity":
        kx = v
    else:
        # Kv: right neighbor's FIRST primal element (0 for the last
        # shard — its final row is the virtual zero row of the pad)
        right_first = jax.lax.ppermute(v[:1], MODEL_AXIS, ring_bwd)
        right_first = jnp.where(mi == M - 1, 0.0, right_first)
        kx = jnp.concatenate([v[1:], right_first]) - v
        virtual = (mi == M - 1) & (jnp.arange(n_loc) == n_loc - 1)
        kx = jnp.where(virtual, 0.0, kx)
    y_new = prox_conjugate(h, y + sigma * kx, sigma)
    if cfg.kkind != "identity":
        # keep the pad's virtual element exactly 0 (prox_{σh*}(0) = 0
        # for every norm here, but pin it against exotic h)
        y_new = jnp.where(virtual, 0.0, y_new)
    return state._replace(x=x_new, y=y_new, it=state.it + 1)


_PD_ST_SPECS = TPPDState(
    tau=P(), sigma=P(), x=P(MODEL_AXIS), y=P(MODEL_AXIS), it=P(),
    status=P(),
)


class TPPANOCCfg(NamedTuple):
    N: int
    D: int
    M: int
    mem: int = 5
    max_ls: int = 10
    zerofpr: bool = False
    adaptive: bool = False


class _TPFBEOracle:
    """``value_sum_and_grad_sum_all`` over the 2-D-sharded oracle —
    the single entry solvers.panoc's FBE machinery needs: raw margins
    psum over "model", then the value and gradient reductions psum over
    "data" (the gradient stays a local "model" shard)."""

    def __init__(self, F):
        self._F = F

    def value_sum_and_grad_sum_all(self, u):
        r = _psum_m(self._F.margin_all(u))
        val = _psum_d(self._F.value_from_margin_all(r))
        gsum = _psum_d(self._F.apply_all(self._F.coeff_from_margin_all(r)))
        return val, gsum

    def value_sum_all(self, u):
        # adaptive γ-backtracking probe: margin psum + value psum only
        r = _psum_m(self._F.margin_all(u))
        return _psum_d(self._F.value_from_margin_all(r))


class _TPProxAdapter:
    """Separable prox on the local coordinate shard whose VALUE psums
    over "model" — the FBE term g(z) must be the global value or the
    replicated line-search condition would diverge across shards."""

    def __init__(self, g):
        self._g = g

    def prox(self, x, gamma):
        z = self._g.prox_only(x, gamma)
        return z, _psum_m(self._g.value(z))


def _tp_rdot(a, b):
    """Re⟨a, b⟩ of model-sharded vectors: local vdot + "model" psum."""
    return _psum_m(jnp.real(jnp.vdot(a, b)))


def _tp_panoc_init(F, g, x0, gamma, sigma, cfg: TPPANOCCfg):
    """2-D-sharded PANOC/ZeroFPR bootstrap (solvers.panoc — beyond the
    reference): the L-BFGS ring shards over "model" with the iterate;
    every scalar carry replicates."""
    from ciao_tpu.solvers import panoc as _p

    rdt = jnp.zeros((), jnp.result_type(x0)).real.dtype
    Fp, gp = _TPFBEOracle(F), _TPProxAdapter(g)
    pcfg = _p.PANOCCfg(N=cfg.N, mem=cfg.mem, max_ls=cfg.max_ls,
                       zerofpr=cfg.zerofpr, tol=None,
                       adaptive=cfg.adaptive)
    fx, gradx, z, gz, _r, fbe = _p._eval_fbe(Fp, gp, x0, gamma, pcfg,
                                             _tp_rdot)
    m = cfg.mem
    paux = x0.size if cfg.zerofpr else 0
    return _p.PANOCState(
        gamma=gamma, sigma=sigma, x=x0, fx=fx, gradx=gradx, z=z,
        gz=jnp.real(gz), fbe=fbe,
        S=jnp.zeros((m, x0.size), x0.dtype),
        Y=jnp.zeros((m, x0.size), x0.dtype),
        rho=jnp.zeros((m,), rdt),
        head=jnp.zeros((), jnp.int32), count=jnp.zeros((), jnp.int32),
        pbase=jnp.zeros((paux,), x0.dtype),
        presid=jnp.zeros((paux,), x0.dtype),
        tau=jnp.ones((), rdt), ls_ewma=jnp.ones((), jnp.float32),
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_panoc_step(F, g, cfg: TPPANOCCfg, state):
    """One 2-D-sharded PANOC/ZeroFPR step (cf. solvers.panoc
    ._panoc_step, reused verbatim): each FBE evaluation is one margin
    psum over "model" + two "data" psums; every two-loop inner product
    psums over "model", so the replicated scalars (and hence the line
    search's trip count) agree across all devices."""
    from ciao_tpu.solvers.panoc import PANOCCfg, _panoc_step

    pcfg = PANOCCfg(N=cfg.N, mem=cfg.mem, max_ls=cfg.max_ls,
                    zerofpr=cfg.zerofpr, tol=None,
                    adaptive=cfg.adaptive)
    return _panoc_step(_TPFBEOracle(F), _TPProxAdapter(g), pcfg, state,
                       rdot=_tp_rdot)


def _panoc_st_specs():
    from ciao_tpu.solvers.panoc import PANOCState

    return PANOCState(
        gamma=P(), sigma=P(), x=P(MODEL_AXIS), fx=P(),
        gradx=P(MODEL_AXIS), z=P(MODEL_AXIS), gz=P(), fbe=P(),
        S=P(None, MODEL_AXIS), Y=P(None, MODEL_AXIS), rho=P(),
        head=P(), count=P(), pbase=P(MODEL_AXIS), presid=P(MODEL_AXIS),
        tau=P(), ls_ewma=P(), it=P(), status=P(),
    )


class TPProshiState(NamedTuple):
    """ProShI sharing-problem state on the ("data","model") mesh: the
    (N, n) block-variable table shards over BOTH axes, γ over "data",
    the coupling pair (av, z) over "model" (replicated across data)."""

    s: jnp.ndarray          # (N, n) block table, P("data","model")
    gamma: jnp.ndarray      # (N,), P("data")
    hat_gamma: jnp.ndarray  # scalar Σγ (global)
    av: jnp.ndarray         # (n,) Σ_i s_i, P("model")
    z: jnp.ndarray          # (n,) coupling variable, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        # pure view of the N block solutions x_i = s_i + γ_i z (the
        # reference mutates its table here, ProShI_basic.jl:127-132)
        return self.s + self.gamma[:, None] * self.z[None, :]


class TPProshiCfg(NamedTuple):
    N: int
    D: int
    M: int
    b_loc: int
    sweeping: int

    @property
    def n_loc(self):
        return self.N // self.D


def _tp_proshi_init(F, g, x0, gamma, key, cfg: TPProshiCfg):
    """2-D-sharded ProShI bootstrap (reference ProShI_basic.jl:45-90).

    The oracle must be coordinate-separable (``F.coordinate_separable``):
    its per-block gradients are then coordinatewise in x, so local
    gradient COLUMNS are exact with no "model" collective — the only
    cross-device traffic in the whole family is the (n/M)-sized "data"
    psum of the coupling sum Σ s_i."""
    from ciao_tpu.parallel.dp import _rows

    n_loc, N = cfg.n_loc, cfg.N
    G = _rows(F, x0, n_loc)                   # local rows × local columns
    s = x0[None, :] - (gamma / N)[:, None] * G
    hat_gamma = _psum_d(jnp.sum(gamma))
    av = _psum_d(jnp.sum(s, axis=0))
    z = _tp_proshi_coupling(g, av, hat_gamma)
    return TPProshiState(
        s=s, gamma=gamma, hat_gamma=hat_gamma, av=av, z=z, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_proshi_coupling(g, av, hat_gamma):
    z = g.prox_only(av, hat_gamma)            # separable: local coordinates
    return (z - av) / hat_gamma


def _tp_proshi_step(F, g, cfg: TPProshiCfg, state: TPProshiState):
    """One ProShI block step (reference ProShI_basic.jl:93-125) on the
    2-D mesh. The index schedule folds only the DATA axis — every member
    of a data row's model group draws the same block, so the table
    columns stay consistent. One (n/M)-sized "data" psum per step."""
    from ciao_tpu.parallel.dp import local_block_start, local_indices
    from ciao_tpu.sampling import Sweep

    N, B = cfg.N, cfg.b_loc
    if cfg.sweeping != Sweep.RANDOM:
        start = local_block_start(state.key, state.it, cfg.n_loc, B,
                                  cfg.sweeping)
        gi = jax.lax.dynamic_slice_in_dim(state.gamma, start, B)
        s_old = jax.lax.dynamic_slice_in_dim(state.s, start, B, 0)
        s_tmp = s_old + gi[:, None] * state.z[None, :]
        G_B = F.grad_pointwise_block(s_tmp, start, B)
        s_new = s_tmp - (gi / N)[:, None] * G_B
        s = jax.lax.dynamic_update_slice_in_dim(state.s, s_new, start, 0)
    else:
        idx = local_indices(state.key, state.it, cfg.n_loc, B, cfg.sweeping)
        gi = state.gamma[idx]
        s_old = state.s[idx]
        s_tmp = s_old + gi[:, None] * state.z[None, :]
        G_B = F.grad_pointwise(s_tmp, idx)
        s_new = s_tmp - (gi / N)[:, None] * G_B
        s = state.s.at[idx].set(s_new)
    av = state.av + _psum_d(jnp.sum(s_new - s_old, axis=0))
    z = _tp_proshi_coupling(g, av, state.hat_gamma)
    return state._replace(s=s, av=av, z=z, it=state.it + 1)


def _tp_proshi_rebase(F, g, cfg: TPProshiCfg, state: TPProshiState):
    """Exact coupling recompute av = Σ s_i (delta-drift control; the
    sharing oracles have no storage modes so this is never REQUIRED,
    but the iterator surface keeps the knob uniform across families)."""
    av = _psum_d(jnp.sum(state.s, axis=0))
    return state._replace(av=av, z=_tp_proshi_coupling(g, av, state.hat_gamma))


_PROSHI_ST_SPECS = TPProshiState(
    s=P(DATA_AXIS, MODEL_AXIS), gamma=P(DATA_AXIS), hat_gamma=P(),
    av=P(MODEL_AXIS), z=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


def _tp_rebase_identity(F, g, cfg, state):
    """LFinito/SVRG recompute their anchor exactly every epoch/outer
    step — storage swaps self-heal after one iterate (cf.
    dp._rebase_identity_local)."""
    return state


class TPLSVRGState(NamedTuple):
    gamma: jnp.ndarray      # scalar stepsize
    p: jnp.ndarray          # scalar refresh probability (f32)
    av: jnp.ndarray         # (n,) anchor μ = ∇f(z), P("model")
    z: jnp.ndarray          # (n,) anchor point, P("model")
    w: jnp.ndarray          # (n,) iterate, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.w


def _tp_lsvrg_init(F, g, x0, gamma, p, key, cfg: TPCfg):
    """2-D-sharded loopless-SVRG bootstrap (solvers.lsvrg — beyond the
    reference): one "model" margin psum + one "data" psum."""
    r = _psum_m(F.margin_all(x0))
    av = _psum_d(F.apply_all(F.coeff_from_margin_all(r))) / cfg.N
    return TPLSVRGState(
        gamma=gamma, p=p, av=av, z=x0, w=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_lsvrg_refresh(F, cfg, at):
    """The anchor-refresh full gradient on the 2-D mesh: one "model"
    margin psum + one "data" psum. Runs INSIDE the coin's ``lax.cond``
    — legal because the coin is replicated (derived from (key, it)
    only), so every device takes the same branch and the collectives
    stay matched."""
    r = _psum_m(F.margin_all(at))
    return _psum_d(F.apply_all(F.coeff_from_margin_all(r))) / cfg.N


def _tp_lsvrg_step(F, g, cfg: TPCfg, state: TPLSVRGState):
    """One loopless-SVRG step on the ("data","model") mesh (cf.
    dp._lsvrg_step_local): the live and anchor margins of the block
    ride ONE stacked (2,B) "model" psum (no anchor-coefficient cache —
    the anchor moves at random times), the variance-reduced direction
    is one x-shard "data" psum, and the Bernoulli refresh runs its
    full-pass collectives inside the replicated-coin cond."""
    from ciao_tpu.solvers.lsvrg import _coin

    N, B = cfg.N, cfg.b_loc
    gamma, av, w = state.gamma, state.av, state.w
    row = jax.lax.axis_index(DATA_AXIS)
    kk = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
    d_loc = cfg.n_loc // B
    start = jax.random.randint(kk, (), 0, d_loc, dtype=jnp.int32) * B
    r2 = _psum_m(jnp.stack([
        F.margin_block(w, start, B),
        F.margin_block(state.z, start, B),
    ]))
    cw = F.coeff_from_margin(r2[0], start, B)
    cz = F.coeff_from_margin(r2[1], start, B)
    d = _psum_d(F.apply_rows_block(cz - cw, start, B)) / (B * cfg.D)
    w_new = g.prox_only(w + gamma * (d - av), gamma)
    flip = _coin(state.key, state.it, state.p)
    z_new, av_new = jax.lax.cond(
        flip,
        lambda: (w, _tp_lsvrg_refresh(F, cfg, w)),
        lambda: (state.z, state.av),
    )
    return state._replace(av=av_new, z=z_new, w=w_new, it=state.it + 1)


def _tp_lsvrg_rebase(F, g, cfg: TPCfg, state: TPLSVRGState):
    """Exact anchor-gradient recompute at the current anchor — needed
    after a storage swap (cf. dp._lsvrg_rebase_local)."""
    return state._replace(av=_tp_lsvrg_refresh(F, cfg, state.z))


_LSVRG_ST_SPECS = TPLSVRGState(
    gamma=P(), p=P(), av=P(MODEL_AXIS), z=P(MODEL_AXIS), w=P(MODEL_AXIS),
    key=P(), it=P(), status=P(),
)


class TPLKatyushaState(NamedTuple):
    Lmax: jnp.ndarray
    sigma: jnp.ndarray
    theta1: jnp.ndarray
    theta2: jnp.ndarray
    p: jnp.ndarray
    av: jnp.ndarray         # (n,) anchor μ = ∇f(w_anchor), P("model")
    w_anchor: jnp.ndarray   # (n,) anchor point, P("model")
    y: jnp.ndarray          # (n,) gradient-step sequence, P("model")
    z: jnp.ndarray          # (n,) mirror-step sequence, P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.y


def _tp_lkatyusha_init(F, g, x0, Lmax, sigma, theta1, theta2, p, key,
                       cfg: TPCfg):
    """2-D-sharded loopless-Katyusha bootstrap (cf. _tp_lsvrg_init)."""
    av = _tp_lsvrg_refresh(F, cfg, x0)
    return TPLKatyushaState(
        Lmax=Lmax, sigma=sigma, theta1=theta1, theta2=theta2, p=p, av=av,
        w_anchor=x0, y=x0, z=x0, key=key, it=jnp.ones((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
    )


def _tp_lkatyusha_step(F, g, cfg: TPCfg, state: TPLKatyushaState):
    """One loopless accelerated step on the 2-D mesh (cf.
    dp._lkatyusha_step_local): the momentum coupling and the proximal
    mirror z-update are coordinate-local (separable prox); the live/
    anchor margins ride one stacked (2,B) "model" psum and the
    direction one x-shard "data" psum; the Bernoulli refresh runs its
    collectives inside the replicated-coin cond."""
    from ciao_tpu.solvers.lsvrg import _coin

    N, B = cfg.N, cfg.b_loc
    th1, th2, sig = state.theta1, state.theta2, state.sigma
    eta = th2 / ((1.0 + th2) * th1)
    step = eta / state.Lmax
    av, w = state.av, state.w_anchor
    x = th1 * state.z + th2 * w + (1.0 - th1 - th2) * state.y
    row = jax.lax.axis_index(DATA_AXIS)
    kk = jax.random.fold_in(jax.random.fold_in(state.key, state.it), row)
    d_loc = cfg.n_loc // B
    start = jax.random.randint(kk, (), 0, d_loc, dtype=jnp.int32) * B
    r2 = _psum_m(jnp.stack([
        F.margin_block(x, start, B),
        F.margin_block(w, start, B),
    ]))
    cx = F.coeff_from_margin(r2[0], start, B)
    cw = F.coeff_from_margin(r2[1], start, B)
    gr = av + _psum_d(F.apply_rows_block(cx - cw, start, B)) / (B * cfg.D)
    denom = 1.0 + eta * sig
    tau = step / denom
    z_new = g.prox_only((state.z + (eta * sig) * x - step * gr) / denom, tau)
    y_new = x + th1 * (z_new - state.z)
    flip = _coin(state.key, state.it, state.p)
    w_new, av_new = jax.lax.cond(
        flip,
        lambda: (state.y, _tp_lsvrg_refresh(F, cfg, state.y)),
        lambda: (state.w_anchor, state.av),
    )
    return state._replace(
        av=av_new, w_anchor=w_new, y=y_new, z=z_new, it=state.it + 1
    )


def _tp_lkatyusha_rebase(F, g, cfg: TPCfg, state: TPLKatyushaState):
    """Exact anchor recompute at the current anchor point."""
    return state._replace(av=_tp_lsvrg_refresh(F, cfg, state.w_anchor))


_LKAT_ST_SPECS = TPLKatyushaState(
    Lmax=P(), sigma=P(), theta1=P(), theta2=P(), p=P(), av=P(MODEL_AXIS),
    w_anchor=P(MODEL_AXIS), y=P(MODEL_AXIS), z=P(MODEL_AXIS), key=P(),
    it=P(), status=P(),
)


# family -> (init_local, step_local, state specs, rebase_local,
#            init in_specs after (F, g))


# ---------------------------------------------------------------------------
# tensor-parallel SSNM (sampled-negative-momentum SAGA)
# ---------------------------------------------------------------------------

class TPSSNMState(NamedTuple):
    """SSNM over ("data", "model"): the coefficient table by sample,
    the stored-point table by sample AND coordinate, the iterate /
    table mean by coordinate (solvers.ssnm re-laid for 2-D sharding)."""

    tau: jnp.ndarray     # scalar momentum weight
    eta: jnp.ndarray     # scalar stepsize
    c: jnp.ndarray       # (N,) P("data")
    zb: jnp.ndarray      # (d, n) P("data", "model")
    gbar: jnp.ndarray    # (n,) P("model")
    x: jnp.ndarray       # (n,) P("model")
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


def _tp_ssnm_init(F, g, x0, tau, eta, key, cfg: TPCfg):
    """Coefficient bootstrap via column-partial margins (cf.
    _tp_saga_init); every stored point x0 (local coordinates)."""
    r = _psum_m(F.margin_all(x0))
    c = F.coeff_from_margin_all(r)
    gbar = _psum_d(F.apply_all(c)) / cfg.N
    d_loc = cfg.n_loc // cfg.b_loc
    zb = jnp.broadcast_to(x0, (d_loc,) + x0.shape)
    return TPSSNMState(
        tau=tau, eta=eta, c=c, zb=zb, gbar=gbar, x=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _tp_ssnm_step(F, g, cfg: TPCfg, state: TPSSNMState):
    """One TP SSNM block step: the momentum point y = τx + (1−τ)·zb[j]
    is a LOCAL coordinate combination (zb shards over both axes), then
    the usual margin psum over "model" and innovation psum over "data";
    the mirror step and prox act on local coordinates."""
    N, B = cfg.N, cfg.b_loc
    tau, eta = state.tau, state.eta
    key, sub = jax.random.split(state.key)
    row = jax.lax.axis_index(DATA_AXIS)
    k = jax.random.fold_in(sub, row)
    j = jax.random.randint(k, (), 0, cfg.n_loc // B, dtype=jnp.int32)
    start = j * B
    y = tau * state.x + (1.0 - tau) * state.zb[j]
    r = _psum_m(F.margin_block(y, start, B))
    c_new = F.coeff_from_margin(r, start, B)
    c_old = jax.lax.dynamic_slice_in_dim(state.c, start, B)
    innov = _psum_d(F.apply_rows_block(c_new - c_old, start, B))
    grad = innov / (B * cfg.D) + state.gbar
    x = g.prox_only(state.x - eta * grad, eta)       # mirror step
    gbar = state.gbar + innov / N
    c = jax.lax.dynamic_update_slice_in_dim(state.c, c_new, start, 0)
    zb = state.zb.at[j].set(y)
    return state._replace(c=c, zb=zb, gbar=gbar, x=x, key=key,
                          it=state.it + 1)


_SSNM_ST_SPECS = TPSSNMState(
    tau=P(), eta=P(), c=P(DATA_AXIS), zb=P(DATA_AXIS, MODEL_AXIS),
    gbar=P(MODEL_AXIS), x=P(MODEL_AXIS), key=P(), it=P(), status=P(),
)


def _tp_ssnm_rebase(F, g, cfg: TPCfg, state: TPSSNMState):
    """2-D mirror of solvers.ssnm.ssnm_rebase (storage-swap repair)."""
    return state._replace(gbar=_psum_d(F.apply_all(state.c)) / cfg.N)


_TP_FAMILY = {
    "pd": (_tp_pd_init, _tp_pd_step, _PD_ST_SPECS, _tp_rebase_identity,
           (P(MODEL_AXIS), P(), P())),
    "saga": (_tp_saga_init, _tp_saga_step, _ST_SPECS, _tp_saga_rebase,
             (P(MODEL_AXIS), P(), P())),
    "finito": (_tp_finito_init, _tp_finito_step, _FIN_ST_SPECS,
               _tp_finito_rebase, (P(MODEL_AXIS), P(DATA_AXIS), P())),
    "lfinito": (_tp_lfinito_init, _tp_lfinito_epoch, _LFIN_ST_SPECS,
                _tp_rebase_identity, (P(MODEL_AXIS), P(DATA_AXIS), P())),
    "svrg": (_tp_svrg_init, _tp_svrg_outer, _SVRG_ST_SPECS,
             _tp_rebase_identity, (P(MODEL_AXIS), P(), P(), P())),
    "katyusha": (_tp_katyusha_init, _tp_katyusha_outer, _KAT_ST_SPECS,
                 _tp_rebase_identity, (P(MODEL_AXIS), P(), P(), P(), P())),
    "lsvrg": (_tp_lsvrg_init, _tp_lsvrg_step, _LSVRG_ST_SPECS,
              _tp_lsvrg_rebase, (P(MODEL_AXIS), P(), P(), P())),
    "lkatyusha": (
        _tp_lkatyusha_init, _tp_lkatyusha_step, _LKAT_ST_SPECS,
        _tp_lkatyusha_rebase,
        (P(MODEL_AXIS), P(), P(), P(), P(), P(), P()),
    ),
    "sarah": (_tp_sarah_init, _tp_sarah_outer, _SARAH_ST_SPECS,
              _tp_rebase_identity, (P(MODEL_AXIS), P(), P(), P())),
    "point_saga": (_tp_point_saga_init, _tp_point_saga_step, _PS_ST_SPECS,
                   _tp_point_saga_rebase, (P(MODEL_AXIS), P(), P())),
    "fb": (_tp_fb_init, _tp_fb_step, _FB_ST_SPECS,
           _tp_rebase_identity, (P(MODEL_AXIS), P())),
    "dys": (_tp_dys_init, _tp_dys_step, _DYS_ST_SPECS,
            _tp_rebase_identity, (P(MODEL_AXIS), P(), P())),
    "panoc": (_tp_panoc_init, _tp_panoc_step, _panoc_st_specs(),
              _tp_rebase_identity, (P(MODEL_AXIS), P(), P())),
    "proshi": (_tp_proshi_init, _tp_proshi_step, _PROSHI_ST_SPECS,
               _tp_proshi_rebase, (P(MODEL_AXIS), P(DATA_AXIS), P())),
    "ssnm": (_tp_ssnm_init, _tp_ssnm_step, _SSNM_ST_SPECS,
             _tp_ssnm_rebase, (P(MODEL_AXIS), P(), P(), P())),
}


@functools.lru_cache(maxsize=64)
def _compiled_tp_family(family: str, mesh, f_treedef, f_specs_leaves,
                        g_treedef, g_specs_leaves, cfg):
    """(init_fn, step_fn, run_fn, rebase_fn) for a TP family on a 2-D
    mesh — the single shard_map/jit assembly shared by every family
    (cf. dp._compiled), cached on the problem STRUCTURE."""
    init_local, step_local, st_specs, rebase_local, init_extra = (
        _TP_FAMILY[family]
    )
    f_specs = jax.tree_util.tree_unflatten(f_treedef, list(f_specs_leaves))
    g_specs = jax.tree_util.tree_unflatten(g_treedef, list(g_specs_leaves))

    def init_body(F, g, *rest):
        return init_local(F, g, *rest, cfg)

    init_fn = jax.jit(jax.shard_map(
        init_body, mesh=mesh, in_specs=(f_specs, g_specs) + init_extra,
        out_specs=st_specs, check_vma=False,
    ))

    step_fn = jax.jit(jax.shard_map(
        lambda F, g, state: step_local(F, g, cfg, state), mesh=mesh,
        in_specs=(f_specs, g_specs, st_specs),
        out_specs=st_specs, check_vma=False,
    ))

    def run_body(F, g, state, steps):
        def body(s, _):
            with jax.named_scope(f"tp_{family}_step"):
                return step_local(F, g, cfg, s), None

        return jax.lax.scan(body, state, None, length=steps)[0]

    run_fn = jax.jit(
        lambda F, g, state, steps: jax.shard_map(
            functools.partial(run_body, steps=steps), mesh=mesh,
            in_specs=(f_specs, g_specs, st_specs),
            out_specs=st_specs, check_vma=False,
        )(F, g, state),
        static_argnames=("steps",),
    )

    rebase_fn = jax.jit(jax.shard_map(
        lambda F, g, state: rebase_local(F, g, cfg, state), mesh=mesh,
        in_specs=(f_specs, g_specs, st_specs),
        out_specs=st_specs, check_vma=False,
    ))
    return init_fn, step_fn, run_fn, rebase_fn


@dataclasses.dataclass(frozen=True)
class TPSVRG:
    """SVRG/SVRG++ on a ("data", "model") mesh — samples AND
    coordinates sharded, no table. Requires a rank-1 oracle and a
    separable prox; ``batch`` is the per-data-row inner block size
    (global inner batch = batch·D); ``m`` counts inner BATCHES."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    m: Optional[int] = None
    plus: bool = False
    seed: int = 0

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError("TPSVRG needs a ('data','model') mesh (make_mesh_2d)")
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPSVRG shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPSVRG needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPSVRG shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError("TPSVRG: need N divisible by D and N/D by batch")
        if x0.size % M != 0:
            raise ValueError("TPSVRG: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if self.gamma is None:
            if L is None:
                raise ValueError("TPSVRG: provide L or γ")
            gamma = 1.0 / (10.0 * jnp.max(jnp.asarray(L, rdt)))
        else:
            gamma = jnp.asarray(self.gamma, rdt)
        m = (N if self.m is None else self.m)
        cfg = TPSVRGCfg(N=N, D=D, M=M, b_loc=self.batch, plus=self.plus)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "svrg", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, jnp.asarray(m, jnp.int32), key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def _effective_maxit(self):
        return min(self.maxit, 25) if self.plus else self.maxit

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self._effective_maxit(), self.verbose, self.freq,
            disp, observe,
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPProshi:
    """ProShI (sharing formulation) on a ("data","model") mesh — the
    N block variables shard over "data" AND their coordinates over
    "model" (beyond the reference, which has no parallelism; SURVEY.md
    §2.3). Requires a COORDINATE-SEPARABLE smooth oracle
    (``F.coordinate_separable`` — diagonal quadratics, box distances,
    sums thereof: the sharing test family, test_sharing.jl:13-24) and a
    separable prox: gradients and the coupling
    z = (prox_g(Σsᵢ, Σγ) − Σsᵢ)/Σγ are then coordinatewise, so the ONLY
    per-step collective is the (n/M)-sized "data" psum of the coupling
    delta — no "model" collective anywhere. ``batch`` is GLOBAL (split
    over the data axis); the schedule folds only the data-axis index,
    so at M=1 the trajectory equals :class:`DPProshi` exactly."""

    mesh: object = None
    gamma: Optional[object] = None
    sweeping: int = 1
    batch: int = 0
    maxit: int = 10000
    verbose: bool = False
    freq: int = 10000
    alpha: float = 0.999
    seed: int = 0

    def __post_init__(self):
        assert self.maxit > 0 and self.freq > 0
        assert self.sweeping in (1, 2, 3)

    def _setup(self, x0, F, g, L, N):
        from ciao_tpu.parallel.dp import _validate_mesh_batch

        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPProshi needs a ('data','model') mesh (make_mesh_2d)"
            )
        M = mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPProshi shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "coordinate_separable", False):
            raise ValueError(
                "TPProshi needs a coordinate-separable oracle (gradients "
                "coordinatewise in x: DiagQuadratic, SqrDistBox, sums "
                f"thereof) — got {type(F).__name__}"
            )
        if x0.size % M != 0:
            raise ValueError("TPProshi: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        batch = self.batch or mesh.shape[DATA_AXIS]
        D, b_loc = _validate_mesh_batch(N, mesh, batch, self.sweeping,
                                        "TPProshi")
        gamma = resolve_gamma_array(self.gamma, L, N, self.alpha, rdt,
                                    who="TPProshi")
        cfg = TPProshiCfg(N=N, D=D, M=M, b_loc=b_loc, sweeping=self.sweeping)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "proshi", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.hat_gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPKatyusha:
    """Katyusha on a ("data", "model") mesh — samples AND coordinates
    sharded (beyond the reference; see :class:`ciao_tpu.solvers.
    Katyusha`). Requires a rank-1 oracle and a separable prox.
    ``batch`` is the per-data-row inner block size (global inner batch
    = batch·D); ``m`` counts inner BATCHES per outer iterate and
    defaults to 2N/(batch·D); ``maxit`` counts outer iterates.
    ``sigma`` sets the strongly-convex τ₁; without it the τ₁ₛ = 2/(s+4)
    non-strongly-convex epoch schedule runs."""

    mesh: object = None
    batch: int = 1
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100
    m: Optional[int] = None
    tau1: Optional[float] = None
    tau2: float = 0.5
    sigma: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert 0.0 < self.tau2 < 1.0
        if self.tau1 is not None:
            assert 0.0 < self.tau1 <= 1.0 - self.tau2

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPKatyusha needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPKatyusha shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPKatyusha needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPKatyusha shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
        if L is None:
            raise ValueError("TPKatyusha: provide the smoothness moduli L")
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError(
                "TPKatyusha: need N divisible by D and N/D by batch"
            )
        if x0.size % M != 0:
            raise ValueError("TPKatyusha: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        Lmax = jnp.max(jnp.asarray(L, rdt))
        m = (2 * N) // (self.batch * D) if self.m is None else self.m
        if m < 1:
            raise ValueError("TPKatyusha: m must be >= 1")
        ns = False
        if self.tau1 is not None:
            tau1 = jnp.asarray(self.tau1, rdt)
        elif self.sigma is not None:
            tau1 = jnp.minimum(
                jnp.sqrt(m * self.batch * D * jnp.asarray(self.sigma, rdt)
                         / (3.0 * Lmax)),
                jnp.asarray(0.5, rdt),
            )
        else:
            ns = True
            tau1 = jnp.asarray(0.5, rdt)  # epoch 0 value of 2/(s+4)
        cfg = TPKatyushaCfg(N=N, D=D, M=M, b_loc=self.batch, m=m, ns=ns)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "katyusha", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        tau2 = jnp.asarray(self.tau2, rdt)
        init = lambda: init_c(F, g, x0, Lmax, tau1, tau2, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.tau1):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPSARAH:
    """SARAH/ProxSARAH on a ("data", "model") mesh — samples AND
    coordinates sharded (beyond the reference; see :class:`ciao_tpu.
    solvers.SARAH`). Requires a rank-1 oracle with the margin protocol
    and a separable prox. ``batch`` is the per-data-row inner block
    size (global inner batch = batch·D); ``m`` counts inner steps per
    outer iterate and defaults to N/(batch·D); ``maxit`` counts outer
    iterates."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100
    m: Optional[int] = None
    eta: float = 1.0
    seed: int = 0

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert 0.0 < self.eta <= 1.0

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPSARAH needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPSARAH shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPSARAH needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            # sparse ELL layouts carry GLOBAL column ids in their idx
            # tables — a coordinate shard cannot evaluate its slots
            # locally, so these oracles are DP/single-chip only
            raise ValueError(
                "TPSARAH shards coordinates and needs the margin "
                "protocol (margin_block/coeff_from_margin — dense "
                f"row oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError(
                "TPSARAH: need N divisible by D and N/D by batch"
            )
        if x0.size % M != 0:
            raise ValueError("TPSARAH: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        else:
            if L is None:
                raise ValueError(
                    "TPSARAH: provide the smoothness moduli L, or a "
                    "stepsize γ"
                )
            gamma = 1.0 / (2.0 * jnp.max(jnp.asarray(L, rdt)))
        m = N // (self.batch * D) if self.m is None else self.m
        if m < 1:
            raise ValueError("TPSARAH: m must be >= 1")
        cfg = TPSARAHCfg(N=N, D=D, M=M, b_loc=self.batch, m=m)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "sarah", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        eta = jnp.asarray(self.eta, rdt)
        init = lambda: init_c(F, g, x0, gamma, eta, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPPointSAGA:
    """Point-SAGA on a ("data", "model") mesh — samples AND coordinates
    sharded (beyond the reference; see :class:`ciao_tpu.solvers.
    PointSAGA`). Per step: one stacked (2,B)-sized "model" psum (block
    margins + row square-norms at the shifted iterate), a replicated
    scalar θ solve, and one x-shard-sized "data" psum. Solves
    min (1/N)Σf_i (no composite g); needs the pointprox margin
    protocol (dense least-squares / logistic rows)."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    sweeping: int = 1
    seed: int = 0

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPPointSAGA needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is not None and not isinstance(g, Zero):
            raise ValueError(
                "TPPointSAGA solves min (1/N)Σ f_i(x) — no separate "
                "composite g (see PointSAGA)"
            )
        g = Zero()
        if not (getattr(F, "supports_pointprox", False)
                and hasattr(F, "pointprox_sqnorm_block")):
            raise ValueError(
                "TPPointSAGA needs a scalar-loss row oracle with the "
                f"pointprox margin protocol; {type(F).__name__} does "
                "not support it"
            )
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError(
                "TPPointSAGA: need N divisible by D and N/D by batch"
            )
        if x0.size % M != 0:
            raise ValueError("TPPointSAGA: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        else:
            if L is None:
                raise ValueError(
                    "TPPointSAGA: provide the smoothness moduli L, or a "
                    "stepsize γ"
                )
            gamma = 1.0 / (3.0 * jnp.max(jnp.asarray(L, rdt)))
        cfg = TPPointSAGACfg(N=N, D=D, M=M, b_loc=self.batch,
                             sweeping=self.sweeping)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "point_saga", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, gamma, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPForwardBackward:
    """ISTA/FISTA on a ("data", "model") mesh (beyond the reference;
    see :class:`ciao_tpu.solvers.ForwardBackward`). One "model" margin
    psum + one "data" gradient-shard psum per full-gradient step;
    ``fast=True`` is FISTA. Requires a rank-1 oracle with the margin
    protocol and a separable prox."""

    mesh: object = None
    gamma: Optional[float] = None
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100
    fast: bool = False
    polish_chunk: int = 0   # >0: compensated chunked local gradient

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0
        assert self.polish_chunk >= 0

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPForwardBackward needs a ('data','model') mesh "
                "(make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPForwardBackward shards coordinates — the prox must be "
                f"separable (got {type(g).__name__})"
            )
        if not hasattr(F, "margin_all"):
            raise ValueError(
                "TPForwardBackward needs the margin protocol (dense row "
                f"oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0:
            raise ValueError("TPForwardBackward: need N divisible by D")
        if x0.size % M != 0:
            raise ValueError(
                "TPForwardBackward: need n divisible by the model axis"
            )
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        else:
            if L is None:
                raise ValueError(
                    "TPForwardBackward: provide the smoothness moduli L, "
                    "or a stepsize γ"
                )
            gamma = 1.0 / jnp.mean(jnp.asarray(L, rdt))
        if self.polish_chunk:
            if (N // D) % self.polish_chunk:
                raise ValueError(
                    f"TPForwardBackward: polish_chunk="
                    f"{self.polish_chunk} must divide the per-device "
                    f"row count {N // D}"
                )
            if getattr(F, "coeff_rows_scale", lambda: None)() is not None:
                raise ValueError(
                    "TPForwardBackward: polish_chunk needs f32/bf16 "
                    "rows (int8 dequant defines a different operator)"
                )
        cfg = TPFBCfg(N=N, D=D, M=M, fast=self.fast,
                      polish_chunk=self.polish_chunk)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "fb", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        init = lambda: init_c(F, g, x0, gamma)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


def TPFISTA(**kwargs) -> TPForwardBackward:
    """``TPForwardBackward(fast=True)``."""
    return TPForwardBackward(fast=True, **kwargs)


@dataclasses.dataclass(frozen=True)
class TPDavisYin:
    """Davis-Yin three-operator splitting on a ("data", "model") mesh
    (beyond the reference; see :class:`ciao_tpu.solvers.DavisYin`):
    minimize (1/N)Σf_i + g + h with BOTH g and h proximable and
    SEPARABLE. The full gradient at the prox point is the TPFB margin
    psum pair (one "model" + one "data" collective per step); both
    proxes and the relaxation are coordinate-local, so the trajectory
    equals single-chip to reduction order. Requires a rank-1 oracle
    with the margin protocol. ``TPDouglasRachford`` is the f = 0 case.
    (Condat-Vũ with a DENSE K stays DP-only — its matvec mixes
    coordinates; the stencil case ships as :class:`TPCondatVu`, round
    4.)"""

    mesh: object = None
    gamma: Optional[float] = None
    lam: float = 1.0
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert 0 < self.lam < 2
        assert self.maxit > 0 and self.freq > 0

    def _setup(self, x0, F, g, h, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPDavisYin needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            if F is None:
                raise ValueError("TPDavisYin: provide F or N")
            N = F.num_terms
        if F is None:
            from ciao_tpu.oracles import ZeroOracle

            F = ZeroOracle(n_terms=N)
        if g is None:
            g = Zero()
        if h is None:
            h = Zero()
        for term, name in ((g, "g"), (h, "h")):
            if not getattr(term, "separable", False):
                raise ValueError(
                    f"TPDavisYin shards coordinates — {name} must be "
                    f"separable (got {type(term).__name__})"
                )
        from ciao_tpu.oracles import ZeroOracle as _ZO

        if not isinstance(F, _ZO) and not hasattr(F, "margin_all"):
            raise ValueError(
                "TPDavisYin needs the margin protocol (dense row "
                f"oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0:
            raise ValueError("TPDavisYin: need N divisible by D")
        if x0.size % M != 0:
            raise ValueError("TPDavisYin: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
        elif L is not None:
            gamma = 1.0 / jnp.mean(jnp.asarray(L, rdt))
        elif isinstance(F, _ZO):
            gamma = jnp.ones((), rdt)  # f = 0: Douglas-Rachford
        else:
            raise ValueError(
                "TPDavisYin: provide the smoothness moduli L, or a "
                "stepsize γ"
            )
        lam = jnp.asarray(self.lam, rdt)
        gh = (g, h)
        cfg = TPFBCfg(N=N, D=D, M=M)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(gh, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "dys", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        init = lambda: init_c(F, gh, x0, gamma, lam)
        step = lambda s: step_c(F, gh, s)
        run = lambda s, k: run_c(F, gh, s, k)
        rebase = lambda s: rebase_c(F, gh, s)
        return x0, F, gh, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, h=None, L=None, N=None,
                 observe=None):
        x0, F, gh, init, step, run, _ = self._setup(x0, F, g, h, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, h=None, L=None, N=None):
        x0_orig = x0
        x0, F, gh, init, step, run, rebase = self._setup(x0, F, g, h, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


def TPDouglasRachford(**kwargs) -> TPDavisYin:
    """``TPDavisYin`` with f = 0 (Douglas-Rachford over the 2-D mesh)."""
    return TPDavisYin(**kwargs)


@dataclasses.dataclass(frozen=True)
class TPCondatVu:
    """Condat-Vũ on a ("data", "model") mesh for STENCIL analysis maps
    (round 4; see :class:`ciao_tpu.solvers.CondatVu`): minimize
    (1/N)Σf_i + g(x) + h(Kx) with K = `FirstDifference` (total
    variation / fused lasso) or `IdentityMap`. The stencil touches only
    adjacent coordinates, so the coordinate shard needs ONE scalar halo
    per neighbor per apply — a single-element `lax.ppermute` riding the
    ICI ring — instead of the n-sized all-gather a general K would
    force (dense `DenseMap` K therefore stays DP-only — `DPCondatVu`).
    The dual is carried padded to (n,) so it shards exactly like x.
    One margin psum over "model" + one gradient psum over "data" + two
    single-scalar ppermutes per step; both proxes coordinate-local
    (separable g, h). ``TPChambollePock`` is the f = 0 case."""

    mesh: object = None
    tau: Optional[float] = None
    sigma: Optional[float] = None
    maxit: int = 1000
    verbose: bool = False
    freq: int = 100

    def __post_init__(self):
        assert self.tau is None or self.tau > 0
        assert self.sigma is None or self.sigma > 0
        assert self.maxit > 0 and self.freq > 0

    def _setup(self, x0, F, g, h, K, L, N):
        from ciao_tpu.ops.linmap import FirstDifference, IdentityMap
        from ciao_tpu.solvers.primal_dual import CondatVu as _CV

        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPCondatVu needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            if F is None:
                raise ValueError("TPCondatVu: provide F or N")
            N = F.num_terms
        if F is None:
            from ciao_tpu.oracles import ZeroOracle

            F = ZeroOracle(n_terms=N)
        if g is None:
            g = Zero()
        if h is None:
            h = Zero()
        if K is None:
            K = IdentityMap()
        if isinstance(K, IdentityMap):
            kkind = "identity"
        elif isinstance(K, FirstDifference):
            kkind = "firstdiff"
        else:
            raise ValueError(
                "TPCondatVu serves stencil maps only (FirstDifference /"
                " IdentityMap) — a dense K mixes coordinates and needs "
                "an n-sized all-gather per step under a coordinate "
                "shard; use DPCondatVu for DenseMap"
            )
        for term, name in ((g, "g"), (h, "h")):
            if not getattr(term, "separable", False):
                raise ValueError(
                    f"TPCondatVu shards coordinates — {name} must be "
                    f"separable (got {type(term).__name__})"
                )
        from ciao_tpu.oracles import ZeroOracle as _ZO

        if not isinstance(F, _ZO) and not hasattr(F, "margin_all"):
            raise ValueError(
                "TPCondatVu needs the margin protocol (dense row "
                f"oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0:
            raise ValueError("TPCondatVu: need N divisible by D")
        if x0.size % M != 0:
            raise ValueError("TPCondatVu: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if L is not None:
            Lf = float(jnp.mean(jnp.asarray(L, rdt)))
        elif isinstance(F, _ZO) or self.tau is not None:
            Lf = 0.0
        else:
            raise ValueError(
                "TPCondatVu: provide the smoothness moduli L, or an "
                "explicit stepsize τ"
            )
        # reuse the single-chip stepsize rule (σ = 1/‖K‖, τ from the
        # convergence condition) so trajectories match exactly
        tau, sigma = _CV(tau=self.tau, sigma=self.sigma)._stepsizes(
            Lf, float(K.opnorm_bound(x0.size)), rdt)
        gh = (g, h)
        cfg = TPPDCfg(N=N, D=D, M=M, kkind=kkind)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(gh, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "pd", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        init = lambda: init_c(F, gh, x0, tau, sigma)
        step = lambda s: step_c(F, gh, s)
        run = lambda s, k: run_c(F, gh, s, k)
        rebase = lambda s: rebase_c(F, gh, s)
        return x0, F, gh, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, h=None, K=None, L=None, N=None,
                 observe=None):
        x0, F, gh, init, step, run, _ = self._setup(x0, F, g, h, K, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.tau):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, h=None, K=None, L=None, N=None):
        x0_orig = x0
        x0, F, gh, init, step, run, rebase = self._setup(
            x0, F, g, h, K, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


def TPChambollePock(**kwargs) -> TPCondatVu:
    """``TPCondatVu`` with f = 0 (Chambolle-Pock over the 2-D mesh)."""
    return TPCondatVu(**kwargs)


@dataclasses.dataclass(frozen=True)
class TPPANOC:
    """PANOC/ZeroFPR on a ("data", "model") mesh (beyond the reference
    — see :class:`ciao_tpu.solvers.PANOC`): rows shard over "data",
    coordinates (iterate, gradient, L-BFGS ring) over "model". Each FBE
    evaluation costs one margin psum over "model" and two "data" psums;
    the line search and two-loop recursion run on replicated scalars,
    so the trajectory equals the single-chip solver to reduction order.
    Requires the margin protocol (dense row oracles) and a separable
    prox."""

    mesh: object = None
    gamma: Optional[float] = None
    alpha: float = 0.95
    beta: float = 0.5
    maxit: int = 100
    mem: int = 5
    max_ls: int = 10
    verbose: bool = False
    freq: int = 10
    zerofpr: bool = False
    adaptive: bool = False  # γ-backtracking (auto when no γ and no L)

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert 0 < self.alpha < 1 and 0 < self.beta < 1
        assert self.maxit > 0 and self.freq > 0
        assert self.mem >= 1 and self.max_ls >= 1

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPPANOC needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPPANOC shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not hasattr(F, "value_from_margin_all"):
            raise ValueError(
                "TPPANOC needs the margin-value protocol "
                "(margin_all/value_from_margin_all — dense row oracles); "
                f"{type(F).__name__} is DP-only"
            )
        if N % D != 0:
            raise ValueError("TPPANOC: need N divisible by D")
        if x0.size % M != 0:
            raise ValueError("TPPANOC: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        adaptive = self.adaptive or (self.gamma is None and L is None)
        if self.gamma is not None:
            gamma = jnp.asarray(self.gamma, rdt)
            if L is not None:
                Lf = jnp.mean(jnp.asarray(L, rdt))
                sigma = self.beta * jnp.maximum(1.0 - gamma * Lf, 0.05) \
                    / (2.0 * gamma)
            else:
                sigma = self.beta * (1.0 - self.alpha) / (2.0 * gamma)
        elif L is not None:
            Lf = jnp.mean(jnp.asarray(L, rdt))
            gamma = self.alpha / Lf
            sigma = self.beta * (1.0 - self.alpha) / (2.0 * gamma)
        else:
            from ciao_tpu.solvers.panoc import _probe_gamma

            gamma = _probe_gamma(F, x0, N, self.alpha, rdt)
            sigma = self.beta * (1.0 - self.alpha) / (2.0 * gamma)
        cfg = TPPANOCCfg(N=N, D=D, M=M, mem=self.mem, max_ls=self.max_ls,
                         zerofpr=self.zerofpr, adaptive=adaptive)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "panoc", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        sigma = jnp.asarray(sigma, rdt)
        init = lambda: init_c(F, g, x0, gamma, sigma)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(
            f"{it:5d} | {float(st.gamma):.3e} | τ={float(st.tau):.3f}"
        )
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        from ciao_tpu.solvers.panoc import warn_if_thrashing

        warn_if_thrashing(state, type(self).__name__)
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


def TPZeroFPR(**kwargs) -> TPPANOC:
    """``TPPANOC(zerofpr=True)``."""
    return TPPANOC(zerofpr=True, **kwargs)


def _tp_guard_loopless(who, mesh, x0, F, g, N, batch):
    """Shared validity envelope of the TP loopless pair: a 2-D mesh, a
    rank-1 dense-row (margin-protocol) oracle, a separable prox, and
    divisibility of N over ("data", batch) and n over "model"."""
    if mesh is None or MODEL_AXIS not in mesh.shape:
        raise ValueError(f"{who} needs a ('data','model') mesh (make_mesh_2d)")
    D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    if N is None:
        N = F.num_terms
    if g is None:
        g = Zero()
    if not getattr(g, "separable", False):
        raise ValueError(
            f"{who} shards coordinates — the prox must be separable "
            f"(got {type(g).__name__})"
        )
    if not getattr(F, "supports_coeff", False):
        raise ValueError(f"{who} needs a rank-1 (coefficient) oracle")
    if not hasattr(F, "margin_block"):
        # sparse ELL layouts carry GLOBAL column ids — DP-only
        raise ValueError(
            f"{who} shards coordinates and needs the margin protocol "
            f"(margin_block/coeff_from_margin — dense row oracles); "
            f"{type(F).__name__} is DP-only"
        )
    if N % D != 0 or (N // D) % batch != 0:
        raise ValueError(f"{who}: need N divisible by D and N/D by batch")
    if x0.size % M != 0:
        raise ValueError(f"{who}: need n divisible by the model axis")
    return D, M, N, g


@dataclasses.dataclass(frozen=True)
class TPLSVRG:
    """Loopless SVRG on a ("data", "model") mesh (beyond the reference;
    see :class:`ciao_tpu.solvers.LSVRG`). Per step: one stacked (2,B)
    "model" margin psum (live + anchor — no anchor-coefficient cache,
    the anchor moves at random times) and one x-shard "data" psum; the
    Bernoulli refresh (replicated coin) runs its full-pass collectives
    inside the cond. ``p`` defaults to batch·D/N; ``maxit`` counts
    steps."""

    mesh: object = None
    gamma: Optional[float] = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    p: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        assert self.gamma is None or self.gamma > 0
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert self.p is None or 0.0 <= self.p <= 1.0

    def _setup(self, x0, F, g, L, N):
        x0 = jnp.asarray(x0)
        D, M, N, g = _tp_guard_loopless(
            "TPLSVRG", self.mesh, x0, F, g, N, self.batch
        )
        rdt = real_dtype_of(x0)
        if self.gamma is None:
            if L is None:
                raise ValueError("TPLSVRG: provide L or γ")
            gamma = 1.0 / (6.0 * jnp.max(jnp.asarray(L, rdt)))
        else:
            gamma = jnp.asarray(self.gamma, rdt)
        p = (self.batch * D) / N if self.p is None else self.p
        cfg = TPCfg(N=N, D=D, M=M, b_loc=self.batch)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "lsvrg", self.mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        p = jnp.asarray(p, jnp.float32)
        init = lambda: init_c(F, g, x0, gamma, p, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.gamma):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPLKatyusha:
    """Loopless Katyusha on a ("data", "model") mesh (beyond the
    reference; see :class:`ciao_tpu.solvers.LKatyusha`). Same
    collective shape as :class:`TPLSVRG`; the momentum coupling and
    proximal mirror z-update are coordinate-local. ``p`` defaults to
    batch·D/N; ``maxit`` counts steps."""

    mesh: object = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    p: Optional[float] = None
    theta1: Optional[float] = None
    theta2: float = 0.5
    sigma: Optional[float] = None
    seed: int = 0

    def __post_init__(self):
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert 0.0 < self.theta2 < 1.0
        assert self.p is None or 0.0 <= self.p <= 1.0
        if self.theta1 is not None:
            assert 0.0 < self.theta1 <= 1.0 - self.theta2

    def _setup(self, x0, F, g, L, N):
        x0 = jnp.asarray(x0)
        D, M, N, g = _tp_guard_loopless(
            "TPLKatyusha", self.mesh, x0, F, g, N, self.batch
        )
        if L is None:
            raise ValueError("TPLKatyusha: provide the smoothness moduli L")
        rdt = real_dtype_of(x0)
        Lmax = jnp.max(jnp.asarray(L, rdt))
        sigma = jnp.asarray(0.0 if self.sigma is None else self.sigma, rdt)
        if self.theta1 is not None:
            theta1 = jnp.asarray(self.theta1, rdt)
        elif self.sigma is not None:
            theta1 = jnp.minimum(
                jnp.sqrt(2.0 * sigma * N / (3.0 * self.batch * D)),
                jnp.asarray(0.5, rdt),
            )
        else:
            theta1 = jnp.asarray(1.0 / 3.0, rdt)
        p = (self.batch * D) / N if self.p is None else self.p
        cfg = TPCfg(N=N, D=D, M=M, b_loc=self.batch)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "lkatyusha", self.mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        p = jnp.asarray(p, jnp.float32)
        theta2 = jnp.asarray(self.theta2, rdt)
        init = lambda: init_c(F, g, x0, Lmax, sigma, theta1, theta2, p, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.theta1):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)


@dataclasses.dataclass(frozen=True)
class TPSSNM:
    """Sampled-negative-momentum SAGA on a ("data", "model") mesh —
    samples AND coordinates sharded (solvers.ssnm). Requires a rank-1
    oracle with the margin protocol and a separable prox; ``batch`` is
    the per-data-row contiguous block size."""

    mesh: object = None
    batch: int = 1
    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    tau: Optional[float] = None
    sigma: Optional[float] = None
    eta: Optional[float] = None
    seed: int = 0

    def _setup(self, x0, F, g, L, N):
        mesh = self.mesh
        if mesh is None or MODEL_AXIS not in mesh.shape:
            raise ValueError(
                "TPSSNM needs a ('data','model') mesh (make_mesh_2d)"
            )
        D, M = mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
        x0 = jnp.asarray(x0)
        if N is None:
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(g, "separable", False):
            raise ValueError(
                "TPSSNM shards coordinates — the prox must be separable "
                f"(got {type(g).__name__})"
            )
        if not getattr(F, "supports_coeff", False):
            raise ValueError("TPSSNM needs a rank-1 (coefficient) oracle")
        if not hasattr(F, "margin_block"):
            raise ValueError(
                "TPSSNM shards coordinates and needs the margin protocol "
                f"(dense row oracles); {type(F).__name__} is DP-only"
            )
        if N % D != 0 or (N // D) % self.batch != 0:
            raise ValueError("TPSSNM: need N divisible by D and N/D by batch")
        if x0.size % M != 0:
            raise ValueError("TPSSNM: need n divisible by the model axis")
        rdt = real_dtype_of(x0)
        if L is None and (self.eta is None or self.tau is None):
            raise ValueError("TPSSNM: provide L, or both τ and η")
        Lmax = None if L is None else jnp.max(jnp.asarray(L, rdt))
        if self.tau is not None:
            tau = jnp.asarray(self.tau, rdt)
        elif self.sigma is not None:
            tau = jnp.minimum(
                jnp.sqrt(N * jnp.asarray(self.sigma, rdt) / (3.0 * Lmax)),
                jnp.asarray(0.5, rdt),
            )
        else:
            tau = jnp.asarray(0.5, rdt)
        eta = (jnp.asarray(self.eta, rdt) if self.eta is not None
               else 1.0 / (3.0 * tau * Lmax))  # the mirror coupling
        cfg = TPCfg(N=N, D=D, M=M, b_loc=self.batch)
        f_specs = data_model_specs(F, N)
        leaves, f_treedef = jax.tree_util.tree_flatten(f_specs)
        g_leaves, g_treedef = jax.tree_util.tree_flatten(
            model_prox_specs(g, x0.size)
        )
        init_c, step_c, run_c, rebase_c = _compiled_tp_family(
            "ssnm", mesh, f_treedef, tuple(leaves), g_treedef,
            tuple(g_leaves), cfg
        )
        key = jax.random.PRNGKey(self.seed)
        init = lambda: init_c(F, g, x0, tau, eta, key)
        step = lambda s: step_c(F, g, s)
        run = lambda s, k: run_c(F, g, s, k)
        rebase = lambda s: rebase_c(F, g, s)
        return x0, F, g, init, step, run, rebase

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, init, step, run, _ = self._setup(x0, F, g, L, N)
        disp = lambda it, st: print(f"{it:5d} | {float(st.tau):.3e}")
        state, it = run_solver_loop(
            init, run, self.maxit, self.verbose, self.freq, disp, observe
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, init, step, run, rebase = self._setup(x0, F, g, L, N)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)
