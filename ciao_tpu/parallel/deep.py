"""``deep_solve_dp`` — the deep-accuracy endgame over a device MESH.

The single-chip plan (:func:`ciao_tpu.deep_solve`: stochastic stage to
the f32 gradient floor → compensated-gradient FISTA polish) composed
from the DP building blocks:

1. **Stochastic stage** — :class:`DPSAGA` in LOCAL-UPDATE mode
   (``local_steps`` fused coefficient-SAGA steps per collective; the
   multi-chip throughput path), run in round chunks until the
   full-pass objective plateaus. The objective itself is one
   auto-sharded value pass over the row-sharded oracle.
2. **Curvature bound** — the same generic :func:`ciao_tpu.power_lmax`
   power iteration, evaluated directly on the SHARDED oracle: the
   margin matvec and back-projection auto-partition over the mesh
   (XLA inserts the psums), so no DP-specific code is needed.
3. **Polish stage** — :class:`DPForwardBackward` with
   ``polish_chunk``: each device accumulates its shard's gradient in
   compensated (two-sum) chunks and ONE x-sized psum combines them —
   the per-shard partial sums are already compensated, so the cross-
   device reduction of D ≈ 8-4096 values adds only ~√D·eps, orders
   below the chunk compensation it rides on.

Same accuracy contract as single-chip ``deep_solve`` (rel ≤ 1e-6 past
the monolithic-f32 floor — pinned on the 8-device CI mesh in
``tests/test_deep.py``), at DP throughput. f32 storage only (the
staged narrow-storage start is a single-chip feature for now).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ciao_tpu.solvers.deep import DeepSolveInfo, _largest_divisor_leq
from ciao_tpu.solvers.polish import power_lmax
from ciao_tpu.solvers.staged import StagedInfo


def deep_solve_dp(
    x0,
    F,
    g=None,
    L=None,
    N: Optional[int] = None,
    *,
    mesh=None,
    batch: int = 0,
    local_steps: int = 16,
    chunk_rounds: int = 64,
    plateau_rtol: float = 1e-5,
    max_rounds: int = 8192,
    gamma: Optional[float] = None,
    polish_steps: int = 16,
    polish_chunk: int = 32_768,
    power_iters: int = 6,
    eta_safety: float = 0.9,
    margin_slack: float = 0.0,
    seed: int = 0,
    observe=None,
) -> Tuple[jnp.ndarray, DeepSolveInfo]:
    """Solve ``min (1/N) Σ f_i + g`` to deep relative accuracy over a
    DP mesh. ``F`` must already be sharded (``shard_finite_sum``) with
    dense f32 rows; ``g`` needs ``prox_only``. ``local_steps`` sets the
    fused steps per collective in the stochastic stage; the polish is
    ``polish_steps`` DP-FISTA passes with per-shard compensated chunks.
    Returns ``(x, DeepSolveInfo)`` (the ``staged`` record carries the
    stochastic stage's per-chunk objectives)."""
    from ciao_tpu.parallel.dp import DPSAGA, DPForwardBackward
    from ciao_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from ciao_tpu.prox import Zero

    if mesh is None:
        mesh = make_mesh()
    if N is None:
        N = F.num_terms
    if g is None:
        g = Zero()
    D = mesh.shape[DATA_AXIS]
    # global batch: must split evenly over the mesh AND tile each shard
    b = batch or min(4096, N // D * D)
    b = max(D, (b // D) * D)
    while (N // D) % (b // D):
        b -= D

    solver = DPSAGA(mesh=mesh, batch=b, block_sampling=True,
                    local_steps=local_steps, gamma=gamma, seed=seed)
    x0r, Fd, g, init, _, run, _ = solver._setup(x0, F, g, L, N)
    state = init()

    @jax.jit
    def _obj(F_, g_, z):
        return F_.value_sum_all(z) / N + g_.value(z)

    objs: List[float] = []
    chunks = 0
    prev = float(_obj(Fd, g, state.z))
    plateaued = False
    while chunks * chunk_rounds < max_rounds:
        state = run(state, chunk_rounds)
        cur = float(_obj(Fd, g, state.z))
        chunks += 1
        objs.append(cur)
        if observe is not None:
            observe(state.z)
        if prev - cur < plateau_rtol * max(abs(prev), 1e-30):
            plateaued = True
            prev = cur
            break
        prev = cur

    sinfo = StagedInfo(storages=["f32"],
                       epochs=[chunks * chunk_rounds * local_steps
                               * b // max(N, 1)],
                       objectives=objs or [prev],
                       switched_early=[plateaued])

    # curvature bound straight on the sharded oracle (auto-partitioned)
    key = jax.random.PRNGKey(seed + 1)
    lmax = float(power_lmax(Fd, state.z, key, iters=power_iters,
                            margin_slack=margin_slack))
    eta = eta_safety / lmax

    pchunk = _largest_divisor_leq(N // D, polish_chunk)
    pol = DPForwardBackward(mesh=mesh, maxit=polish_steps, fast=True,
                            gamma=eta, polish_chunk=pchunk)
    x, _ = pol(state.z, F=Fd, g=g)
    if observe is not None:
        observe(x)
    return x, DeepSolveInfo(staged=sinfo, lmax=lmax, eta=eta,
                            polish_steps=polish_steps, fp_res=[])


def deep_solve_tp(
    x0,
    F,
    g=None,
    L=None,
    N: Optional[int] = None,
    *,
    mesh,
    batch: int = 0,
    chunk_steps: int = 2048,
    plateau_rtol: float = 1e-5,
    max_steps: int = 262_144,
    gamma: Optional[float] = None,
    polish_steps: int = 16,
    polish_chunk: int = 32_768,
    power_iters: int = 6,
    eta_safety: float = 0.9,
    margin_slack: float = 0.0,
    seed: int = 0,
    observe=None,
) -> Tuple[jnp.ndarray, DeepSolveInfo]:
    """The deep-accuracy plan on a ("data", "model") mesh — the
    TENSOR-PARALLEL face of :func:`ciao_tpu.deep_solve` (huge-n
    problems whose iterate itself shards over coordinates):

    1. TPSAGA in step chunks to the objective plateau (margins psum
       over "model", innovation psum over "data");
    2. the curvature bound from the same generic :func:`power_lmax`
       evaluated on the 2-D-sharded oracle (auto-partitioned jit);
    3. TP-FISTA polish with ``polish_chunk`` — each (data, model)
       shard's compensated chunked gradient, hi/lo carries psum'd
       separately over "data".

    ``F`` must be sharded with ``shard_finite_sum_2d`` (dense f32
    rows); ``g`` separable. Pinned to rel ≤ 1e-6 on the CI mesh in
    ``tests/test_deep.py``."""
    from ciao_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from ciao_tpu.parallel.tp import TPForwardBackward, TPSAGA
    from ciao_tpu.prox import Zero

    if MODEL_AXIS not in getattr(mesh, "shape", {}):
        raise ValueError("deep_solve_tp needs a ('data','model') mesh")
    if N is None:
        N = F.num_terms
    if g is None:
        g = Zero()
    D = mesh.shape[DATA_AXIS]
    b = batch or D

    solver = TPSAGA(mesh=mesh, batch=b, gamma=gamma, seed=seed)
    x0r, Fd, g, init, _, run, _ = solver._setup(x0, F, g, L, N)
    state = init()

    @jax.jit
    def _obj(F_, g_, z):
        return F_.value_sum_all(z) / N + g_.value(z)

    objs: List[float] = []
    chunks = 0
    prev = float(_obj(Fd, g, state.z))
    plateaued = False
    while chunks * chunk_steps < max_steps:
        state = run(state, chunk_steps)
        cur = float(_obj(Fd, g, state.z))
        chunks += 1
        objs.append(cur)
        if observe is not None:
            observe(state.z)
        if prev - cur < plateau_rtol * max(abs(prev), 1e-30):
            plateaued = True
            prev = cur
            break
        prev = cur

    sinfo = StagedInfo(
        storages=["f32"],
        epochs=[chunks * chunk_steps * b // max(N, 1)],
        objectives=objs or [prev], switched_early=[plateaued])

    key = jax.random.PRNGKey(seed + 1)
    lmax = float(power_lmax(Fd, state.z, key, iters=power_iters,
                            margin_slack=margin_slack))
    eta = eta_safety / lmax

    pchunk = _largest_divisor_leq(N // D, polish_chunk)
    pol = TPForwardBackward(mesh=mesh, maxit=polish_steps, fast=True,
                            gamma=eta, polish_chunk=pchunk)
    x, _ = pol(state.z, F=Fd, g=g)
    if observe is not None:
        observe(x)
    return x, DeepSolveInfo(staged=sinfo, lmax=lmax, eta=eta,
                            polish_steps=polish_steps, fp_res=[])
