"""Fused contiguous-block table-refresh kernels (Pallas TPU).

One solver step on a contiguous index block [start, start+B) must:

  1. read the oracle rows   A[start:start+B]      (B·n floats)
  2. read the table rows    s[start:start+B]      (B·n floats)
  3. compute row gradients  G_i = scale·(a_i·z − b_i)·a_i   (MXU matvec
     + VPU row scale; least-squares rows, reference test_lasso.jl:54)
  4. write the new table rows and reduce the x-sized innovation

Steps 1-4 are ONE streaming pass: each TILE×n tile goes HBM→VMEM,
is transformed, and the new tile + an innovation partial go back — no
intermediate HBM round-trips, no gather/scatter. The block start is a
scalar-prefetch operand feeding the BlockSpec index maps, so one
compiled kernel serves every (data-dependent) block choice; the table
is updated in place via input_output_aliases.

Two variants share the pipeline (reference semantics):
  * SAGA  (SAGA_basic.jl:61-65):  s_i ← ∇f_i(z);  innov = Σ (s_new−s_old)
  * Finito (Finito_basic.jl:110-117): s_i ← z − (γ_i/N)∇f_i(z);
        innov = Σ (s_new−s_old)·(hat_γ/γ_i)

f32 only (TPU-native dtype); callers fall back to the XLA dynamic-slice
path for f64/complex/CPU (solvers/saga.py, solvers/finito.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ciao_tpu import runtime


def _pick_tile(B: int, N: int, n: int = 1024, reserve: int = 0,
               esize: int = 4) -> int:
    """Largest row-tile dividing the block and the table that keeps the
    kernel's scoped-VMEM working set under the 16 MB limit. Model
    (calibrated against real Mosaic compiles — the N=65536 TILE=1024
    2-dot kernel allocates 25.46M = 6 tile buffers + resident slabs;
    the validated N=262144 TILE=512 Finito launch sits at 15.8M):
    every streaming kernel here costs SIX tile-sized buffers of the
    A-storage element size (A double-buffered plus the copies Mosaic
    makes for the two dot uses, A·z and Δcᵀ·A), on top of ``reserve``
    bytes the kernel keeps resident for the whole launch (coefficient
    slab / anchor table: in-block + out-block + scratch carry each).
    Narrow-n problems (n ≲ 256) take tiles beyond 1024 rows — fewer
    grid steps amortize the per-tile fixed cost (slab-row DMAs, Mosaic
    step overhead). ``esize`` = A's storage itemsize: narrow storage
    takes proportionally larger tiles — measured on v5e (n=1024,
    N=262144): int8 TILE=2048 runs +21 % over TILE=512 and TILE=4096
    OOMs the compile, exactly the 6-buffer boundary; bf16 is
    tile-neutral (230→232 M samples/s at 1024)."""
    budget_rows = max(0, 16_646_144 - reserve) // (6 * esize * max(n, 1))
    for t in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget_rows and B % t == 0 and N % t == 0:
            return t
    return 0


def _slab_reserve(N: int) -> int:
    """VMEM held for a whole launch by kernels that keep the (8, N/8)
    f32 coefficient slab resident: in block + out block + the scratch
    carry = 3 slab-sized allocations (in/out alias in HBM but each has
    its own VMEM window)."""
    return 3 * 4 * N


def fused_block_available(N: int, n: int, B: int, dtype) -> bool:
    """True when the fused kernel can serve (N, n, B, dtype) on this
    backend: TPU, f32, lane-aligned n, tileable rows. ``start`` must
    then also be a multiple of the chosen tile — guaranteed because
    block starts are multiples of B."""
    return (
        runtime.on_tpu()
        and jnp.dtype(dtype) == jnp.float32
        and n % 128 == 0
        and _pick_tile(B, N, n) >= 8
    )


# MXU precision of the in-kernel dots. "highest" = exact f32 (6 MXU
# passes per dot on v5e — the kernels are then COMPUTE-bound, not HBM-
# bound); "default" = bf16 multiplies with f32 accumulation (1 pass),
# matching what plain jnp.dot already does on TPU in the XLA stepwise
# paths. Facades expose this as ``fused_precision``.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _stream_dot(x, A_t, dims, prec):
    """``dot_general`` against the streamed row tile ``A_t``. When the
    oracle rows are STORED bf16 (``LeastSquaresRows.with_storage``) the
    small operand is cast to bf16 too — a single MXU pass with f32
    accumulation — halving the kernel's HBM traffic; f32 storage keeps
    the caller's requested precision. int8-stored rows (quartered
    traffic) are cast to bf16 in VMEM (exact: |q| ≤ 127) and dotted the
    same way; the caller applies the per-row dequant scales to the
    (1, TILE) margin/innovation vectors, never to the tile."""
    if A_t.dtype == jnp.int8:
        A_t = A_t.astype(jnp.bfloat16)
    if A_t.dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        x, A_t, dims, preferred_element_type=jnp.float32, precision=prec
    )


def _row_grad(A_t, b_t, z_t, scale, prec):
    """Least-squares row gradients of one tile on the MXU:
    G = scale·(A_t z − b)·A_t."""
    if A_t.dtype == jnp.bfloat16:
        A_t = A_t.astype(jnp.float32)
    r = jnp.dot(
        A_t,
        z_t[0, :][:, None],
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (TILE, 1)
    return (scale * (r - b_t)) * A_t


def _saga_kernel(prec, start_ref, A_ref, b_ref, s_ref, z_ref, sc_ref,
                 s_out_ref, innov_ref):
    i = pl.program_id(0)
    G = _row_grad(A_ref[:], b_ref[:], z_ref, sc_ref[0, 0], prec)
    innov_ref[i, :] = jnp.sum(G - s_ref[:], axis=0)
    s_out_ref[:] = G


def _finito_kernel(prec, start_ref, A_ref, b_ref, s_ref, g_ref, z_ref,
                   sc_ref, s_out_ref, innov_ref):
    i = pl.program_id(0)
    scale, inv_n, hat = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
    G = _row_grad(A_ref[:], b_ref[:], z_ref, scale, prec)
    gi = g_ref[:]                                     # (TILE, 1)
    s_new = z_ref[0, :][None, :] - (gi * inv_n) * G
    innov_ref[i, :] = jnp.sum((s_new - s_ref[:]) * (hat / gi), axis=0)
    s_out_ref[:] = s_new


def _row_spec(TILE, n):
    return pl.BlockSpec((TILE, n), lambda i, st: (st[0] // TILE + i, 0))


def _col_spec(TILE):
    return pl.BlockSpec((TILE, 1), lambda i, st: (st[0] // TILE + i, 0))


def _bcast_spec(shape):
    return pl.BlockSpec(shape, lambda *_: (0, 0))


@functools.partial(
    jax.jit, static_argnames=("B", "precision"), donate_argnums=(2,)
)
def saga_block_update(A, b2, s, z2, start, scale2, B: int,
                      precision: str = "highest"):
    """SAGA table refresh on rows [start, start+B): returns
    ``(s_updated, Σ_B (∇f_i(z) − s_i_old))`` with s updated IN PLACE
    (donate s). ``b2`` is b[:, None]; ``z2`` is z[None, :]; ``scale2``
    the (1,1) row-gradient scale (= N for the reference's LeastSquares
    scaling)."""
    N, n = A.shape
    TILE = _pick_tile(B, N, n)
    num_tiles = B // TILE
    acc_rows = max(8, num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            _row_spec(TILE, n),                       # A
            _col_spec(TILE),                          # b
            _row_spec(TILE, n),                       # s (old rows)
            _bcast_spec((1, n)),                      # z
            pl.BlockSpec((1, 1), lambda i, st: (0, 0),
                         memory_space=pltpu.SMEM),    # scale
        ],
        out_specs=[
            _row_spec(TILE, n),                       # s (new rows)
            _bcast_spec((acc_rows, n)),               # innovation partials
        ],
    )
    s_new, innov = pl.pallas_call(
        functools.partial(_saga_kernel, _PRECISIONS[precision]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n), s.dtype),
            jax.ShapeDtypeStruct((acc_rows, n), jnp.float32),
        ],
        input_output_aliases={3: 0},  # s -> s_new (in-place table)
    )(jnp.reshape(start, (1,)).astype(jnp.int32), A, b2, s, z2, scale2)
    return s_new, jnp.sum(innov[:num_tiles], axis=0)


# ---------------------------------------------------------------------------
# multi-step fused kernel (coefficient tables)
# ---------------------------------------------------------------------------
#
# Per-launch fixed cost on this backend is ~0.1 ms — comparable to the
# whole step once tables are coefficient-compressed. This kernel runs K
# SOLVER STEPS per launch: grid (K, tiles-per-block), with av/z carried
# in VMEM scratch across grid steps (TPU grids execute sequentially) and
# the prox applied IN-KERNEL at each block boundary. Traffic per step is
# exactly one pass over the block's oracle rows.

MODE_LSQ = 0       # c = scale·(a_i·z − b_i)        (least-squares rows)
MODE_LOGISTIC = 1  # c = −y_i·σ(−y_i·a_i·z)          (logistic rows)
MODE_HUBER = 2     # c = scale·clip(a_i·z − b_i, ±δ) (Huber rows; aux = δ)
MODE_SQHINGE = 3   # c = −scale·y_i·max(0, 1 − y_i·a_i·z)  (smooth SVM)
MODE_POISSON = 4   # c = scale·(exp(min(m, M)) − y_i)  (Poisson GLM, log link)

# Poisson link safeguard: beyond margin M the exponential is extended
# LINEARLY (value) / frozen (coefficient) — the pair stays a consistent
# C¹ loss, and exp never overflows f32 in-kernel. PoissonRows uses the
# same constant so oracle and kernels compute the identical function.
POISSON_CLAMP = 30.0


def _coeff_formula(mode, r, b_t, scale, aux=0.0):
    c_lsq = scale * (r - b_t)
    c_log = -b_t * jax.nn.sigmoid(-b_t * r)
    # Huber: clip(scale·(r−b), ±scale·δ) ≡ scale·clip(r−b, ±δ)
    c_hub = jnp.clip(c_lsq, -scale * aux, scale * aux)
    # squared hinge (smooth SVM; b_t carries the labels y)
    c_sqh = -scale * b_t * jnp.maximum(1.0 - b_t * r, 0.0)
    # Poisson GLM (b_t carries the counts y): clamped-link mean rate
    c_poi = scale * (jnp.exp(jnp.minimum(r, POISSON_CLAMP)) - b_t)
    return jnp.where(mode == MODE_LSQ, c_lsq,
                     jnp.where(mode == MODE_LOGISTIC, c_log,
                               jnp.where(mode == MODE_HUBER, c_hub,
                                         jnp.where(mode == MODE_SQHINGE,
                                                   c_sqh, c_poi))))


SLAB_ROWS = 8  # coefficient slab layout: (8, N/8), c_i at (i·8//N, i mod N/8)


def rows_scale_slab(F):
    """The oracle's per-row int8 dequant scales in the (8, N/8) slab
    layout (``rs8`` operand of the multistep kernels), or None for
    f32/bf16 rows. One place for the hasattr + reshape plumbing the
    fused drivers all need."""
    rs = F.coeff_rows_scale() if hasattr(F, "coeff_rows_scale") else None
    if rs is None:
        return None
    return rs.reshape(SLAB_ROWS, rs.size // SLAB_ROWS)


def rows_scale_row(F):
    """The dequant scales as the (1, N) row operand of
    ``coeff_apply_all`` (``rs1``), or None for f32/bf16 rows."""
    rs = F.coeff_rows_scale() if hasattr(F, "coeff_rows_scale") else None
    return None if rs is None else rs[None, :]


def coeff_multistep_available(N: int, n: int, B: int, dtype) -> bool:
    """Gate for the K-step fused kernel: the coefficient vector lives in
    an (8, N/8) VMEM scratch for the whole launch (hazard-free block
    revisits, zero per-step table traffic); blocks must tile the slab
    rows evenly and the slab must fit VMEM."""
    return (
        fused_block_available(N, n, B, dtype)
        and N % (SLAB_ROWS * B) == 0
        # lane-aligned (1, TILE) slices; tile shrinks with the resident slab
        and _pick_tile(B, N, n, _slab_reserve(N)) >= 128
        and 4 * N <= 4 * 1024 * 1024     # c slab ≤ 4 MB (N ≤ 1M rows)
    )


def _saga_coeff_multi_kernel(prec, quant, weighted, starts_ref, *rest):
    if weighted:
        # importance sampling: per-step unbiasedness weights 1/(d·q_j)
        # ride a second scalar-prefetch operand; they scale the
        # DIRECTION only, never the exact table-mean delta
        wgt_ref, A_ref, b_ref, *refs = rest
    else:
        wgt_ref = None
        A_ref, b_ref, *refs = rest
    if quant:
        (rs_ref, c_in_ref, z_in_ref, av_in_ref, sc_ref, c_out_ref,
         z_out_ref, av_out_ref, c_vm, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, z_in_ref, av_in_ref, sc_ref, c_out_ref,
         z_out_ref, av_out_ref, c_vm, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # γ·λ (0 disables the prox: g = Zero)
    invB = sc_ref[0, 3]
    invN = sc_ref[0, 4]
    sag = sc_ref[0, 5]
    mode = sc_ref[0, 6]
    aux = sc_ref[0, 7]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]
    ncols = c_vm.shape[1]    # N / 8

    @pl.when((k == 0) & (t == 0))
    def _():
        c_vm[...] = c_in_ref[...]
        av_vm[...] = av_in_ref[...]
        z_vm[...] = z_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    # r as a LANE-major (1, TILE) row: z·A_tᵀ — no transposes/reshapes
    r = _stream_dot(
        z_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    off = pl.multiple_of(abs_start % ncols, 128)
    # b block carries all 8 slab rows at this lane offset (sublane-rule
    # compliant); select the row of this block dynamically
    b_t = b_ref[pl.ds(row, 1), :]                   # (1, TILE)
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]             # (1, TILE) dequant
        r = r * rs_t
    c_new = _coeff_formula(mode, r, b_t, scale, aux)
    # the coefficient slab stays in VMEM for the whole launch — block
    # revisits within a launch are hazard-free (no in/out DMA race)
    c_old = c_vm[pl.ds(row, 1), pl.ds(off, TILE)]   # (1, TILE)
    dc = c_new - c_old
    c_vm[pl.ds(row, 1), pl.ds(off, TILE)] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n)

    @pl.when(t == T - 1)
    def _():
        innov = innov_vm[...]
        av, z = av_vm[...], z_vm[...]
        av_new = av + innov * invN
        wgt = wgt_ref[k] if weighted else 1.0
        # SAG refreshes the average BEFORE the direction (biased),
        # SAGA after (unbiased) — SAGA_basic.jl:57-62
        w = jnp.where(
            sag > 0, z - gamma * av_new,
            z - gamma * (innov * (wgt * invB) + av)
        )
        av_vm[...] = av_new
        z_vm[...] = jnp.sign(w) * jnp.maximum(jnp.abs(w) - thr, 0.0)

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        c_out_ref[...] = c_vm[...]
        z_out_ref[...] = z_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3,),
)
def saga_coeff_multistep(A, b8, starts, c8, z2, av2, scalars, B: int,
                         precision: str = "highest", rs8=None,
                         wgts=None, interpret: bool = False):
    """K = len(starts) coefficient-mode SAGA/SAG block steps in ONE
    kernel launch. ``b8``/``c8`` are the offsets/coefficients in the
    (8, N/8) row-major slab layout; ``z2``/``av2`` are (1, n);
    ``scalars`` is the (1, 8) row [scale, γ, γλ, 1/B, 1/N, sag, mode, aux].
    Returns (c8, z2, av2) updated. The L1 prox (soft-threshold; γλ=0 for
    g=Zero) runs in-kernel at each block boundary. For int8-stored rows
    pass the per-row dequant scales as ``rs8`` in the same slab layout
    (required iff A.dtype is int8). ``wgts``: optional (K,) f32
    importance-sampling direction weights 1/(d·q_j) aligned with
    ``starts`` (uniform draws pass None). ``interpret`` runs the GENERIC
    Pallas interpreter — the CPU-CI path for use under shard_map, where
    TPU interpret mode (``force_tpu_interpret_mode``) deadlocks."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    weighted = wgts is not None
    TILE = _pick_tile(B, N, n, _slab_reserve(N), esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st, *p):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    wgt_ops = [wgts.astype(jnp.float32)] if weighted else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + (1 if weighted else 0),
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n),
                         lambda k, t, st, *p: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets (all rows)
            *rs_specs,                                # dequant scales
            _bcast_spec((SLAB_ROWS, ncols)),          # c slab (whole)
            _bcast_spec((1, n)),                      # z in
            _bcast_spec((1, n)),                      # av in
            pl.BlockSpec((1, 8), lambda k, t, st, *p: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((SLAB_ROWS, ncols)),          # c slab out
            _bcast_spec((1, n)),                      # z out
            _bcast_spec((1, n)),                      # av out
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB_ROWS, ncols), jnp.float32),  # c carry
            pltpu.VMEM((1, n), jnp.float32),          # av carry
            pltpu.VMEM((1, n), jnp.float32),          # z carry
            pltpu.VMEM((1, n), jnp.float32),          # innovation accum
        ],
    )
    c_new, z_new, av_new = pl.pallas_call(
        functools.partial(
            _saga_coeff_multi_kernel, _PRECISIONS[precision], quant, weighted
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((SLAB_ROWS, ncols), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops) + len(wgt_ops): 0},  # c slab
        interpret=interpret,
    )(starts.astype(jnp.int32), *wgt_ops, A, b8, *rs_ops, c8, z2, av2,
      scalars)
    return c_new, z_new, av_new


# ---------------------------------------------------------------------------
# multi-step fused SAGA, STREAMED coefficient table (any N)
# ---------------------------------------------------------------------------
#
# The slab kernel above keeps the whole coefficient vector in VMEM,
# which caps it at N ≤ 1M. Here the table instead lives in HBM as a
# (1, N) row and STREAMS through (1, TILE) windows with input/output
# aliasing — the ProShI pattern — so N is unbounded (the 10M BASELINE
# config fuses). The (1, N) layout is deliberate: (1, TILE) blocks of a
# (1, N) array satisfy Mosaic's sublane rule (block dim0 == array
# dim0), and block-aligned windows of DISTINCT blocks never overlap,
# so the only write hazard is a same-launch block revisit — handled
# exactly like the clamped ProShI drivers: the (K,) schedule carries a
# clamp count f (first duplicate), masked steps k ≥ f stream a
# conflict-free redirected window unchanged, and the driver advances
# the stateless schedule by f only.

def _redirect_masked(starts, f, B: int, N: int):
    """Masked-step redirect shared by the clamped streaming kernels
    (this one and proshi_multistep): steps j ≥ f point their aliased
    windows at a block with ZERO committed visits — which exists
    whenever f < K ≤ d (enforced by the callers) — so their identity
    write-back cannot race a committed write. Returns the rewritten
    starts with the clamp count appended (the kernels' trailing
    prefetch slot)."""
    d = N // B
    K = starts.shape[0]
    assert K <= d, (
        f"clamped streaming launches need K={K} <= d={d} blocks — a "
        "masked step could otherwise only redirect onto a committed "
        "block and race its write-back"
    )
    blocks = starts // B
    live = (jnp.arange(K, dtype=jnp.int32) < f)
    hits = jnp.zeros(d, jnp.int32).at[blocks].add(live.astype(jnp.int32))
    free = jnp.argmin(hits).astype(jnp.int32)
    starts = jnp.where(live, starts, free * B)
    return jnp.concatenate(
        [starts.astype(jnp.int32), f.astype(jnp.int32)[None]]
    )


def coeff_multistep_streamed_available(N: int, n: int, B: int,
                                       dtype) -> bool:
    """Gate for the streamed-table SAGA kernel: lane-aligned (1, TILE)
    windows and enough blocks that birthday clamping stays efficient
    (committed ≈ min(K, 1.25√d) of each K-window)."""
    return (
        fused_block_available(N, n, B, dtype)
        and _pick_tile(B, N, n, esize=jnp.dtype(dtype).itemsize) >= 128
        and N % B == 0
        and N // B >= 64
    )


def _saga_stream_kernel(prec, quant, weighted, starts_ref, *rest):
    if weighted:
        wgt_ref, A_ref, b_ref, *refs = rest
    else:
        wgt_ref = None
        A_ref, b_ref, *refs = rest
    if quant:
        (rs_ref, c_in_ref, z_in_ref, av_in_ref, sc_ref, c_out_ref,
         z_out_ref, av_out_ref, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, z_in_ref, av_in_ref, sc_ref, c_out_ref,
         z_out_ref, av_out_ref, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    thr = sc_ref[0, 2]
    invB = sc_ref[0, 3]
    invN = sc_ref[0, 4]
    sag = sc_ref[0, 5]
    mode = sc_ref[0, 6]
    aux = sc_ref[0, 7]
    fclamp = starts_ref[K]
    committed = k < fclamp

    @pl.when((k == 0) & (t == 0))
    def _():
        av_vm[...] = av_in_ref[...]
        z_vm[...] = z_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(z_vm[...], A_t, (((1,), (1,)), ((), ())), prec)
    b_t = b_ref[:]                                  # (1, TILE)
    if quant:
        rs_t = rs_ref[:]
        r = r * rs_t
    c_old = c_in_ref[:]                             # streamed window
    c_new = jnp.where(committed,
                      _coeff_formula(mode, r, b_t, scale, aux), c_old)
    dc = c_new - c_old                              # 0 when masked
    c_out_ref[:] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(dc, A_t, (((1,), (0,)), ((), ())), prec)

    @pl.when(t == T - 1)
    def _():
        innov = innov_vm[...]
        av, z = av_vm[...], z_vm[...]
        av_new = av + innov * invN
        wgt = wgt_ref[k] if weighted else 1.0
        w = jnp.where(
            sag > 0, z - gamma * av_new,
            z - gamma * (innov * (wgt * invB) + av)
        )
        av_vm[...] = av_new                         # = av when masked
        z_vm[...] = jnp.where(
            committed, jnp.sign(w) * jnp.maximum(jnp.abs(w) - thr, 0.0), z
        )

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        z_out_ref[...] = z_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3,),
)
def saga_coeff_multistep_streamed(A, b1, starts, c1, z2, av2, scalars,
                                  B: int, precision: str = "highest",
                                  rs1=None, wgts=None, f=None,
                                  interpret: bool = False):
    """K = len(starts) coefficient-mode SAGA/SAG block steps in one
    launch with the (1, N) coefficient table STREAMED (donated) —
    serves any N. ``b1``/``c1``/``rs1`` are (1, N) rows; ``scalars``
    the (1, 8) row [scale, γ, γλ, 1/B, 1/N, sag, mode, aux]; ``f`` the
    clamp count (None = all K distinct, the caller's contract).
    Returns (c1, z2, av2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    weighted = wgts is not None
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    if f is None:
        f = jnp.asarray(K, jnp.int32)
        starts = jnp.concatenate(
            [starts.astype(jnp.int32), f[None]]
        )
    else:
        starts = _redirect_masked(starts, f, B, N)

    def win_idx(k, t, st, *p):
        return (0, st[k] // TILE + t)

    rs_specs = [pl.BlockSpec((1, TILE), win_idx)] if quant else []
    rs_ops = [rs1] if quant else []
    wgt_ops = [wgts.astype(jnp.float32)] if weighted else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + (1 if weighted else 0),
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n),
                         lambda k, t, st, *p: (st[k] // TILE + t, 0)),
            pl.BlockSpec((1, TILE), win_idx),         # offsets
            *rs_specs,                                # dequant scales
            pl.BlockSpec((1, TILE), win_idx),         # c window (in)
            _bcast_spec((1, n)),                      # z in
            _bcast_spec((1, n)),                      # av in
            pl.BlockSpec((1, 8), lambda k, t, st, *p: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), win_idx),         # c window (out)
            _bcast_spec((1, n)),                      # z out
            _bcast_spec((1, n)),                      # av out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),          # av carry
            pltpu.VMEM((1, n), jnp.float32),          # z carry
            pltpu.VMEM((1, n), jnp.float32),          # innovation accum
        ],
    )
    c_new, z_new, av_new = pl.pallas_call(
        functools.partial(
            _saga_stream_kernel, _PRECISIONS[precision], quant, weighted
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops) + len(wgt_ops): 0},  # c
        interpret=interpret,
    )(starts, *wgt_ops, A, b1, *rs_ops, c1, z2, av2, scalars)
    return c_new, z_new, av_new


# ---------------------------------------------------------------------------
# multi-step fused SVRG inner loop (coefficient anchor)
# ---------------------------------------------------------------------------
#
# SVRG's inner update (SVRG_basic.jl:74-81) reads TWO gradients per index
# — the anchor ∇f_i(z_full) and the live ∇f_i(w). For rank-1 row
# gradients the anchor compresses to the (N,) coefficient vector
# c_anchor = c(z_full), precomputed ONCE per outer step; the inner
# update then needs only ONE pass over the block's oracle rows:
#
#     d      = (1/B)·Σ_B (c_anchor_i − c_i(w))·a_i
#     w      ← prox_g(w + γ(d − av), γ)
#     zsum   += w
#
# Unlike the SAGA slab, c_anchor is READ-ONLY within a launch, so it
# streams from HBM tile-by-tile — no VMEM residency cap on N.

def svrg_multistep_available(N: int, n: int, B: int, dtype) -> bool:
    """Gate for the K-inner-steps-per-launch SVRG kernel: block starts
    must tile the (8, N/8) slab rows evenly and tiles must be
    lane-aligned; the anchor streams, so N is otherwise unbounded."""
    return (
        fused_block_available(N, n, B, dtype)
        and N % (SLAB_ROWS * B) == 0
        and _pick_tile(B, N, n) >= 128
    )


def _svrg_coeff_multi_kernel(ncols, prec, quant, starts_ref, A_ref, b_ref,
                             *refs):
    """``ncols`` = N/8 is bound statically by the caller (the slab-row
    index of a block is start // ncols)."""
    if quant:
        (rs_ref, canch_ref, w_in_ref, zs_in_ref, av_ref, sc_ref,
         w_out_ref, zs_out_ref, w_vm, zs_vm, innov_vm) = refs
    else:
        rs_ref = None
        (canch_ref, w_in_ref, zs_in_ref, av_ref, sc_ref,
         w_out_ref, zs_out_ref, w_vm, zs_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # γ·λ (0 disables the prox: g = Zero)
    invB = sc_ref[0, 3]
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        w_vm[...] = w_in_ref[...]
        zs_vm[...] = zs_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        w_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]                 # (1, TILE)
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]           # (1, TILE) dequant
        r = r * rs_t
    c_live = _coeff_formula(mode, r, b_t, scale, aux)
    c_anch = canch_ref[pl.ds(row, 1), :]          # (1, TILE)
    dc = c_anch - c_live
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n)

    @pl.when(t == T - 1)
    def _():
        d = innov_vm[...] * invB
        wv = w_vm[...] + gamma * (d - av_ref[...])
        w_new = jnp.sign(wv) * jnp.maximum(jnp.abs(wv) - thr, 0.0)
        w_vm[...] = w_new
        zs_vm[...] += w_new

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        w_out_ref[...] = w_vm[...]
        zs_out_ref[...] = zs_vm[...]


def _comp_add(hi_vm, lo_vm, p):
    """Two-sum accumulate ``p`` into the (hi, lo) VMEM pair: the add's
    rounding error is captured exactly into the compensation buffer
    (Knuth two-sum — free VPU work next to the row stream). The
    cross-tile accumulation noise drops from ~√T·eps to O(eps²), which
    is what lets the one-pass anchors/FBE reads serve the deep-target
    polish accuracy (docs/DESIGN.md §8)."""
    hi = hi_vm[...]
    s = hi + p
    t = s - hi
    lo_vm[...] += (p - t) + (hi - (s - t))
    hi_vm[...] = s


def _coeff_apply_kernel(prec, quant, A_ref, b_ref, *refs):
    """One streaming pass: per row-tile compute the coefficient
    c_i = c(z)_i and accumulate the partial Σ c_i·a_i — the full
    gradient sum — without a second read of A. The cross-tile sum is
    two-sum compensated."""
    if quant:
        (rs_ref, z_ref, sc_ref, c_ref, av_ref, acc_vm, lo_vm) = refs
    else:
        rs_ref = None
        (z_ref, sc_ref, c_ref, av_ref, acc_vm, lo_vm) = refs
    i = pl.program_id(0)
    T = pl.num_programs(0)
    scale = sc_ref[0, 0]
    mode = sc_ref[0, 1]
    aux = sc_ref[0, 2]       # oracle formula parameter (Huber δ)

    @pl.when(i == 0)
    def _():
        acc_vm[...] = jnp.zeros_like(acc_vm)
        lo_vm[...] = jnp.zeros_like(lo_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        z_ref[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    if quant:
        r = r * rs_ref[...]
    c = _coeff_formula(mode, r, b_ref[...], scale, aux)
    c_ref[...] = c
    cw = c * rs_ref[...] if quant else c
    _comp_add(acc_vm, lo_vm, _stream_dot(
        cw, A_t, (((1,), (0,)), ((), ())), prec,
    ))  # (1, n)

    @pl.when(i == T - 1)
    def _():
        av_ref[...] = acc_vm[...] + lo_vm[...]


@functools.partial(
    jax.jit, static_argnames=("tile", "precision", "interpret"),
)
def coeff_apply_all(A, b1, z2, scalars, tile: int,
                    precision: str = "highest", rs1=None,
                    interpret: bool = False):
    """Anchor refresh in ONE pass over A: returns ``(c1, gsum2)`` where
    c1 is the (1, N) coefficient row c(z) and gsum2 the (1, n) full
    gradient sum Σ c_i·a_i (caller divides by N and reshapes c as
    needed). Replaces coeff_all + apply_all / grad_sum_all, which cost
    2-3 passes over A. ``b1`` is the (1, N) offset row; ``rs1`` the
    (1, N) dequant-scale row, required iff the rows are int8-stored."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    T = N // tile
    rs_specs = [pl.BlockSpec((1, tile), lambda i: (0, i))] if quant else []
    rs_ops = [rs1] if quant else []

    c1, gsum = pl.pallas_call(
        functools.partial(_coeff_apply_kernel, _PRECISIONS[precision], quant),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0)),   # A row tile
            pl.BlockSpec((1, tile), lambda i: (0, i)),   # b tile
            *rs_specs,                                   # dequant scales
            pl.BlockSpec((1, n), lambda i: (0, 0)),      # z
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i)),   # c tile
            pl.BlockSpec((1, n), lambda i: (0, 0)),      # gradient sum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(A, b1, *rs_ops, z2, scalars)
    return c1, gsum


def _value_formula(mode, r, b_t, scale, aux=0.0):
    """Per-row loss values from the (already dequant-scaled) margins —
    the value-side twin of ``_coeff_formula`` (PANOC's FBE needs
    f AND ∇f from the same streamed pass)."""
    res = r - b_t
    v_lsq = 0.5 * scale * res * res
    # stable log(1+exp(t)), t = −y·r (b_t carries the labels y)
    t = -b_t * r
    v_log = jnp.maximum(t, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(t)))
    a = jnp.abs(res)
    v_hub = scale * jnp.where(a <= aux, 0.5 * res * res,
                              aux * (a - 0.5 * aux))
    h = jnp.maximum(1.0 - b_t * r, 0.0)
    v_sqh = 0.5 * scale * h * h
    # Poisson NLL (up to the x-independent log(y!)): exp(m) − y·m, with
    # the C¹ linear extension past the clamp matching _coeff_formula
    M = POISSON_CLAMP
    eM = jnp.exp(M)
    v_poi = scale * (jnp.where(r <= M, jnp.exp(jnp.minimum(r, M)),
                               eM * (1.0 + (r - M))) - b_t * r)
    return jnp.where(mode == MODE_LSQ, v_lsq,
                     jnp.where(mode == MODE_LOGISTIC, v_log,
                               jnp.where(mode == MODE_HUBER, v_hub,
                                         jnp.where(mode == MODE_SQHINGE,
                                                   v_sqh, v_poi))))


def _coeff_value_apply_kernel(prec, quant, A_ref, b_ref, *refs):
    """One streaming pass: per row-tile compute the coefficients AND
    the per-row loss values from the same margin, accumulating both the
    value sum and the gradient sum Σ c_i·a_i — the whole FBE oracle
    read of PANOC/ZeroFPR in a single read of A."""
    if quant:
        (rs_ref, z_ref, sc_ref, val_ref, c_ref, av_ref,
         acc_vm, lo_vm, vacc_vm, vlo_vm) = refs
    else:
        rs_ref = None
        (z_ref, sc_ref, val_ref, c_ref, av_ref,
         acc_vm, lo_vm, vacc_vm, vlo_vm) = refs
    i = pl.program_id(0)
    T = pl.num_programs(0)
    scale = sc_ref[0, 0]
    mode = sc_ref[0, 1]
    aux = sc_ref[0, 2]

    @pl.when(i == 0)
    def _():
        acc_vm[...] = jnp.zeros_like(acc_vm)
        lo_vm[...] = jnp.zeros_like(lo_vm)
        vacc_vm[...] = jnp.zeros_like(vacc_vm)
        vlo_vm[...] = jnp.zeros_like(vlo_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        z_ref[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    if quant:
        r = r * rs_ref[...]
    c = _coeff_formula(mode, r, b_ref[...], scale, aux)
    c_ref[...] = c
    v = _value_formula(mode, r, b_ref[...], scale, aux)
    # both cross-tile sums two-sum compensated: the FBE's f-value
    # resolution is what the PANOC line search compares σ-decrements
    # against, and the gradient sum is the anchor accuracy
    _comp_add(vacc_vm, vlo_vm, jnp.sum(v, axis=-1, keepdims=True))
    cw = c * rs_ref[...] if quant else c
    _comp_add(acc_vm, lo_vm, _stream_dot(
        cw, A_t, (((1,), (0,)), ((), ())), prec,
    ))  # (1, n)

    @pl.when(i == T - 1)
    def _():
        av_ref[...] = acc_vm[...] + lo_vm[...]
        val_ref[...] = vacc_vm[...] + vlo_vm[...]


def coeff_value_apply_all(A, b1, z2, scalars, tile: int,
                          precision: str = "highest", rs1=None,
                          interpret: bool = False):
    """PANOC's FBE oracle read in ONE pass over A: returns
    ``(val, c1, gsum2)`` — the (1, 1) loss sum Σf_i(z), the (1, N)
    coefficient row c(z) and the (1, n) gradient sum Σ c_i·a_i (caller
    divides by N). Replaces the XLA value_sum_and_grad_sum_all, which
    costs 2 passes (margin matmul + cᵀA matmul). Same operand contract
    as :func:`coeff_apply_all`."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    T = N // tile
    rs_specs = [pl.BlockSpec((1, tile), lambda i: (0, i))] if quant else []
    rs_ops = [rs1] if quant else []

    val, c1, gsum = pl.pallas_call(
        functools.partial(_coeff_value_apply_kernel,
                          _PRECISIONS[precision], quant),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0)),   # A row tile
            pl.BlockSpec((1, tile), lambda i: (0, i)),   # b tile
            *rs_specs,                                   # dequant scales
            pl.BlockSpec((1, n), lambda i: (0, 0)),      # z
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),      # value sum
            pl.BlockSpec((1, tile), lambda i: (0, i)),   # c tile
            pl.BlockSpec((1, n), lambda i: (0, 0)),      # gradient sum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, 1), jnp.float32),
                        pltpu.VMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(A, b1, *rs_ops, z2, scalars)
    return val, c1, gsum


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def svrg_coeff_multistep(A, b8, canch8, starts, w2, zs2, av2, scalars,
                         B: int, precision: str = "highest", rs8=None,
                         interpret: bool = False):
    """K = len(starts) SVRG inner block steps in one kernel launch.
    ``b8``/``canch8`` are the offsets/anchor coefficients in the
    (8, N/8) slab layout; ``w2``/``zs2``/``av2`` are (1, n); ``scalars``
    the (1, 6) row [scale, γ, γλ, 1/B, mode, aux]. Returns (w2, zs2) after
    the K prox steps (L1 soft-threshold in-kernel; γλ=0 for g=Zero).
    ``rs8``: per-row dequant scales (slab layout), required iff the
    rows are int8-stored."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _svrg_coeff_multi_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # anchor coeffs
            _bcast_spec((1, n)),                        # w in
            _bcast_spec((1, n)),                        # zsum in
            _bcast_spec((1, n)),                        # av (read-only)
            pl.BlockSpec((1, 6), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((1, n)),                        # w out
            _bcast_spec((1, n)),                        # zsum out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # w carry
            pltpu.VMEM((1, n), jnp.float32),            # zsum carry
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    w_new, zs_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, canch8, w2, zs2, av2, scalars)
    return w_new, zs_new


@functools.partial(
    jax.jit, static_argnames=("B", "precision"), donate_argnums=(2,)
)
def finito_block_update(A, b2, s, gamma2, z2, start, scalars, B: int,
                        precision: str = "highest"):
    """Finito table refresh on rows [start, start+B): returns
    ``(s_updated, Σ_B (s_new − s_old)·hat_γ/γ_i)``. ``gamma2`` is
    gamma[:, None]; ``scalars`` is the (1,3) row [scale, 1/N, hat_γ]."""
    N, n = A.shape
    TILE = _pick_tile(B, N, n)
    num_tiles = B // TILE
    acc_rows = max(8, num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            _row_spec(TILE, n),                       # A
            _col_spec(TILE),                          # b
            _row_spec(TILE, n),                       # s (old rows)
            _col_spec(TILE),                          # gamma
            _bcast_spec((1, n)),                      # z
            pl.BlockSpec((1, 3), lambda i, st: (0, 0),
                         memory_space=pltpu.SMEM),    # [scale, 1/N, hat]
        ],
        out_specs=[
            _row_spec(TILE, n),
            _bcast_spec((acc_rows, n)),
        ],
    )
    s_new, innov = pl.pallas_call(
        functools.partial(_finito_kernel, _PRECISIONS[precision]),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n), s.dtype),
            jax.ShapeDtypeStruct((acc_rows, n), jnp.float32),
        ],
        input_output_aliases={3: 0},
    )(jnp.reshape(start, (1,)).astype(jnp.int32), A, b2, s, gamma2, z2, scalars)
    return s_new, jnp.sum(innov[:num_tiles], axis=0)


# ---------------------------------------------------------------------------
# fused LFinito block sweep (low-memory variant, coefficient anchor)
# ---------------------------------------------------------------------------
#
# One LFinito epoch (Finito_LFinito.jl:77-103) = a full-gradient refresh
# at z_full plus a sweep over all blocks:
#
#     z   = prox_g(av, hat_γ)                       (block start)
#     av += (hat_γ/N)·Σ_B (c(z_full)_i − c(z)_i)·a_i
#           + hat_γ·(Σ_B 1/γ_i)·(z − z_full)        (block end)
#
# The anchor coefficients c(z_full) come from the one-pass
# ``coeff_apply_all`` refresh; this kernel runs the whole sweep (K
# blocks, any visit order via scalar-prefetched starts) in one launch
# with av/z carried in VMEM — ONE pass over A per sweep, so an epoch
# costs two passes total (the XLA path costs four).

def lfinito_sweep_available(N: int, n: int, B: int, dtype) -> bool:
    """Gate for the fused LFinito sweep: the anchor streams like the
    SVRG kernel, and the per-launch scalars (visit order, per-position
    1/γ sums) are chunked by the driver — no cap on N or the block
    count d."""
    return (
        fused_block_available(N, n, B, dtype)
        and N % (SLAB_ROWS * B) == 0
        and _pick_tile(B, N, n) >= 128
        and N // B >= 1
    )


def _lfinito_sweep_kernel(ncols, prec, quant, starts_ref, A_ref, b_ref,
                          *refs):
    if quant:
        (rs_ref, canch_ref, zf_ref, av_in_ref, invg_ref, sc_ref,
         av_out_ref, z_out_ref, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (canch_ref, zf_ref, av_in_ref, invg_ref, sc_ref,
         av_out_ref, z_out_ref, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    hat = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # hat_γ·λ (0 disables the prox: g = Zero)
    invN = sc_ref[0, 3]
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        av_vm[...] = av_in_ref[...]

    @pl.when(t == 0)
    def _():
        # block start: z = prox_g(av, hat_γ) (Finito_LFinito.jl:92)
        # (the stepwise path likewise ignores the incoming z: every
        # block overwrites it before use, Finito_LFinito.jl:92)
        av = av_vm[...]
        z_vm[...] = jnp.sign(av) * jnp.maximum(jnp.abs(av) - thr, 0.0)
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        z_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_live = _coeff_formula(mode, r, b_t, scale, aux)
    c_anch = canch_ref[pl.ds(row, 1), :]
    dc = c_anch - c_live
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n)

    @pl.when(t == T - 1)
    def _():
        invg_k = invg_ref[0, k]             # per-POSITION Σ 1/γ of block k
        z = z_vm[...]
        av_vm[...] += (hat * invN) * innov_vm[...] + (hat * invg_k) * (
            z - zf_ref[...]
        )

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        av_out_ref[...] = av_vm[...]
        z_out_ref[...] = z_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def lfinito_sweep_multistep(A, b8, canch8, starts, av2, zf2, invg2,
                            scalars, B: int, precision: str = "highest",
                            rs8=None, interpret: bool = False):
    """K = len(starts) LFinito block steps in one launch. ``b8``/
    ``canch8`` are the offsets/anchor coefficients in the (8, N/8) slab
    layout; ``av2``/``zf2`` are (1, n); ``invg2`` is (1, K) — the
    Σ 1/γ_i of the k'th VISITED block (i.e. already permuted into visit
    order, so the kernel never needs the global (d,) table and the
    driver can chunk an epoch into several launches); ``scalars`` the
    (1, 6) row [scale, hat_γ, hat_γ·λ, 1/N, mode, aux]. Returns (av2, z2) —
    z is the last block's prox point (no z input: each block recomputes
    z = prox(av) before use). ``rs8``: per-row dequant scales (slab
    layout), required iff the rows are int8-stored."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _lfinito_sweep_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # anchor coeffs
            _bcast_spec((1, n)),                        # z_full
            _bcast_spec((1, n)),                        # av in
            pl.BlockSpec((1, K), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),      # invg (visit order)
            pl.BlockSpec((1, 6), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((1, n)),                        # av out
            _bcast_spec((1, n)),                        # z out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # av carry
            pltpu.VMEM((1, n), jnp.float32),            # z carry
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    av_new, z_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, canch8, zf2, av2, invg2,
      scalars)
    return av_new, z_new


# ---------------------------------------------------------------------------
# multi-step fused Finito kernel (coefficient tables + per-block anchors)
# ---------------------------------------------------------------------------

def finito_multistep_available(N: int, n: int, B: int, dtype) -> bool:
    """Finito variant additionally carries the (d, n) per-block anchor
    slab (d = N/B) in VMEM and the (1, d) inverse-stepsize sums in SMEM."""
    d = N // B if B else 0
    return (
        coeff_multistep_available(N, n, B, dtype)
        and d >= 1
        and d * n * 4 <= 2 * 1024 * 1024   # zb slab ≤ 2 MB
        and d <= 1024                       # invg row fits SMEM
        # the zb anchor slab is also VMEM-resident (3 allocations)
        and _pick_tile(B, N, n, _slab_reserve(N) + 3 * d * n * 4) >= 128
    )


def _finito_coeff_multi_kernel(prec, quant, starts_ref, A_ref, b_ref,
                               *refs):
    """K Finito-basic coefficient steps per launch (exact algebra of
    solvers.finito._finito_coeff_step, reference Finito_basic.jl:110-118):

        innov = hat·invg_j·(z − zb_j) − (hat/N)·Σ_B (Δc)·a_i
        av += innov;  zb_j ← z;  z ← soft-threshold(av, hat·λ)
    """
    if quant:
        (rs_ref, c_in_ref, zb_in_ref, invg_ref, z_in_ref, av_in_ref,
         sc_ref, c_out_ref, zb_out_ref, z_out_ref, av_out_ref,
         c_vm, zb_vm, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, zb_in_ref, invg_ref, z_in_ref, av_in_ref,
         sc_ref, c_out_ref, zb_out_ref, z_out_ref, av_out_ref,
         c_vm, zb_vm, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    inv_n = sc_ref[0, 1]    # 1/N
    hat = sc_ref[0, 2]      # hat_γ
    thr = sc_ref[0, 3]      # hat_γ·λ (0 for g = Zero)
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]      # oracle formula parameter (Huber δ)
    # (slot 5 was a dead block-size placeholder — never read)
    TILE = A_ref.shape[0]
    ncols = c_vm.shape[1]

    @pl.when((k == 0) & (t == 0))
    def _():
        c_vm[...] = c_in_ref[...]
        zb_vm[...] = zb_in_ref[...]
        av_vm[...] = av_in_ref[...]
        z_vm[...] = z_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        z_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    off = pl.multiple_of(abs_start % ncols, 128)
    b_t = b_ref[pl.ds(row, 1), :]
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_new = _coeff_formula(mode, r, b_t, scale, aux)
    c_old = c_vm[pl.ds(row, 1), pl.ds(off, TILE)]
    dc = c_new - c_old
    c_vm[pl.ds(row, 1), pl.ds(off, TILE)] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )

    @pl.when(t == T - 1)
    def _():
        j = starts_ref[k] // (T * TILE)     # block id
        invg_j = invg_ref[0, j]
        zb_j = zb_vm[pl.ds(j, 1), :]        # (1, n)
        z = z_vm[...]
        innov = hat * invg_j * (z - zb_j) - (hat * inv_n) * innov_vm[...]
        av = av_vm[...] + innov
        av_vm[...] = av
        zb_vm[pl.ds(j, 1), :] = z
        z_vm[...] = jnp.sign(av) * jnp.maximum(jnp.abs(av) - thr, 0.0)

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        c_out_ref[...] = c_vm[...]
        zb_out_ref[...] = zb_vm[...]
        z_out_ref[...] = z_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3, 4),
)
def finito_coeff_multistep(A, b8, starts, c8, zb, invg2, z2, av2, scalars,
                           B: int, precision: str = "highest", rs8=None,
                           interpret: bool = False):
    """K = len(starts) coefficient-mode Finito-basic block steps in one
    launch. ``c8``/``b8`` use the (8, N/8) slab layout; ``zb`` is the
    (d, n) per-block anchor table; ``invg2`` the (1, d) per-block
    Σ 1/γ_i; ``scalars`` = [scale, 1/N, hat_γ, hat_γλ, mode, aux].
    ``rs8``: per-row dequant scales (slab layout), required iff the
    rows are int8-stored. ``interpret`` runs the GENERIC Pallas
    interpreter — the CPU-CI path for use under shard_map, where TPU
    interpret mode (``force_tpu_interpret_mode``) deadlocks."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, _slab_reserve(N) + 3 * (N // B) * n * 4,
                      esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    d = N // B
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),
            *rs_specs,                                # dequant scales
            _bcast_spec((SLAB_ROWS, ncols)),          # c slab
            _bcast_spec((d, n)),                      # zb anchors
            pl.BlockSpec((1, d), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),    # invg
            _bcast_spec((1, n)),                      # z in
            _bcast_spec((1, n)),                      # av in
            pl.BlockSpec((1, 6), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((SLAB_ROWS, ncols)),
            _bcast_spec((d, n)),
            _bcast_spec((1, n)),
            _bcast_spec((1, n)),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB_ROWS, ncols), jnp.float32),
            pltpu.VMEM((d, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
    )
    nrs = len(rs_ops)
    c_new, zb_new, z_new, av_new = pl.pallas_call(
        functools.partial(
            _finito_coeff_multi_kernel, _PRECISIONS[precision], quant
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((SLAB_ROWS, ncols), jnp.float32),
            jax.ShapeDtypeStruct((d, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        # c slab, zb anchors in-place
        input_output_aliases={3 + nrs: 0, 4 + nrs: 1},
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, c8, zb, invg2, z2, av2,
      scalars)
    return c_new, zb_new, z_new, av_new


# ---------------------------------------------------------------------------
# shared fused-kernel drivers (used by both the single-chip solvers and
# the shard_map'd DP local-update paths — keep the launch plumbing in
# ONE place so the kernel inputs can never desynchronize between them)
# ---------------------------------------------------------------------------

def oracle_scalar_consts(F, g):
    """(scale, mode, lam, aux) — the oracle/prox constants every
    coefficient kernel's SMEM scalar row carries. ``aux`` is the
    oracle's extra formula parameter (Huber δ; 0 for LSQ/logistic) —
    the LAST slot of every scalars row so the per-kernel slot layouts
    stay fixed."""
    scale = jnp.asarray(getattr(F, "scale", 1.0), jnp.float32)
    mode = jnp.asarray(float(F.coeff_mode), jnp.float32)
    lam = getattr(g, "lam", 0.0)
    aux = jnp.asarray(getattr(F, "delta", 0.0), jnp.float32)
    return scale, mode, lam, aux


def lfinito_sweep_chunked(A, b8, c8, starts, invg_v, av2, zf2, scalars,
                          B: int, precision: str = "highest", rs8=None,
                          interpret: bool = False, chunk: int = 512):
    """Drive a whole epoch's block sweep (visit order ``starts``, the
    per-position Σ1/γ in ``invg_v``) as one or more
    ``lfinito_sweep_multistep`` launches: the per-launch scalar-prefetch
    arrays are chunked to ``chunk`` blocks and av carries across
    launches. Returns ``(av2, z2)`` with z2 the last block's prox
    point (the kernel recomputes z = prox(av) per block — z never feeds
    back between launches)."""
    d = starts.shape[0]
    Kc = min(chunk, d)
    Lc = d // Kc
    rem = d - Lc * Kc

    def launch(av2, st_c, ig_c):
        return lfinito_sweep_multistep(
            A, b8, c8, st_c, av2, zf2, ig_c[None, :], scalars, B,
            precision=precision, rs8=rs8, interpret=interpret,
        )

    if Lc == 1 and rem == 0:
        return launch(av2, starts, invg_v)

    def chunk_body(av2, xs):
        av2, z2 = launch(av2, *xs)
        return av2, z2

    av2, z2s = jax.lax.scan(
        chunk_body, av2,
        (
            starts[: Lc * Kc].reshape(Lc, Kc),
            invg_v[: Lc * Kc].reshape(Lc, Kc),
        ),
    )
    z2 = z2s[-1]
    if rem:
        av2, z2 = launch(av2, starts[Lc * Kc:], invg_v[Lc * Kc:])
    return av2, z2


def svrg_inner_chunked(A, b8, canch8, w2, zs2, av2, scalars, B: int,
                       m: int, starts_fn, precision: str = "highest",
                       rs8=None, interpret: bool = False,
                       launch_steps: int = 64):
    """Run ``floor(m/K)·K`` of an SVRG inner loop's m block steps as
    K-steps-per-launch ``svrg_coeff_multistep`` calls (w/zsum carried in
    VMEM within a launch, threaded between launches).
    ``starts_fn(k0, K)`` must return the (K,) block starts for inner
    steps [k0, k0+K) — the caller owns the sampling stream so the
    single-chip and shard_map'd paths keep their distinct key
    derivations. Returns ``(w2, zs2, done)``; the caller runs the
    ``m − done`` remainder on its stepwise path with the same stream."""
    K = min(launch_steps, m)
    Lq = m // K

    def body(carry, q):
        w2, zs2 = carry
        starts = starts_fn(q * K, K)
        w2, zs2 = svrg_coeff_multistep(
            A, b8, canch8, starts, w2, zs2, av2, scalars, B,
            precision=precision, rs8=rs8, interpret=interpret,
        )
        return (w2, zs2), None

    (w2, zs2), _ = jax.lax.scan(
        body, (w2, zs2), jnp.arange(Lq, dtype=jnp.int32)
    )
    return w2, zs2, Lq * K


# ---------------------------------------------------------------------------
# beyond-reference fused kernels: Katyusha / SARAH / Point-SAGA
# ---------------------------------------------------------------------------
#
# All three share the SVRG inner loop's data shape — one contiguous
# block of oracle rows per step, margins on the MXU, O(n) vector algebra
# at the block boundary — so they reuse the (8, N/8) slab layouts, the
# scalar-prefetched starts, and the VMEM-carried iterates of
# ``svrg_coeff_multistep``. Measured XLA baselines (PERF.md): each sat
# ~2x off the streaming ceiling (three A passes per block + per-step
# dispatch); fused they pay exactly one row pass per step.


def _katyusha_coeff_multi_kernel(ncols, prec, quant, starts_ref, A_ref,
                                 b_ref, *refs):
    """K Katyusha (Allen-Zhu 2018, Option II) inner block steps per
    launch. Eval point x = τ₁z + τ₂x̃ + (1−τ₁−τ₂)y is formed in VMEM at
    each block start; the anchor gradient is the coefficient slab
    c(x̃) streamed tile-by-tile (like SVRG's — read-only, so N is
    unbounded)."""
    if quant:
        (rs_ref, canch_ref, xt_ref, y_in_ref, z_in_ref, ys_in_ref,
         av_ref, sc_ref, y_out_ref, z_out_ref, ys_out_ref,
         y_vm, z_vm, ys_vm, x_vm, innov_vm) = refs
    else:
        rs_ref = None
        (canch_ref, xt_ref, y_in_ref, z_in_ref, ys_in_ref,
         av_ref, sc_ref, y_out_ref, z_out_ref, ys_out_ref,
         y_vm, z_vm, ys_vm, x_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    alpha = sc_ref[0, 1]
    beta = sc_ref[0, 2]
    athr = sc_ref[0, 3]      # α·λ (0 disables the prox: g = Zero)
    bthr = sc_ref[0, 4]      # β·λ
    invB = sc_ref[0, 5]
    mode = sc_ref[0, 6]
    tau1 = sc_ref[0, 7]
    tau2 = sc_ref[0, 8]
    aux = sc_ref[0, 9]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        y_vm[...] = y_in_ref[...]
        z_vm[...] = z_in_ref[...]
        ys_vm[...] = ys_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)
        x_vm[...] = (tau1 * z_vm[...] + tau2 * xt_ref[...]
                     + (1.0 - tau1 - tau2) * y_vm[...])

    A_t = A_ref[:]
    r = _stream_dot(
        x_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]                 # (1, TILE)
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]           # (1, TILE) dequant
        r = r * rs_t
    c_live = _coeff_formula(mode, r, b_t, scale, aux)
    c_anch = canch_ref[pl.ds(row, 1), :]          # (1, TILE)
    dc = c_live - c_anch                          # ∇f_i(x) − ∇f_i(x̃)
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n)

    @pl.when(t == T - 1)
    def _():
        gr = av_ref[...] + innov_vm[...] * invB   # ∇̃
        zv = z_vm[...] - alpha * gr
        z_new = jnp.sign(zv) * jnp.maximum(jnp.abs(zv) - athr, 0.0)
        yv = x_vm[...] - beta * gr
        y_new = jnp.sign(yv) * jnp.maximum(jnp.abs(yv) - bthr, 0.0)
        z_vm[...] = z_new
        y_vm[...] = y_new
        ys_vm[...] += y_new

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        y_out_ref[...] = y_vm[...]
        z_out_ref[...] = z_vm[...]
        ys_out_ref[...] = ys_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def katyusha_coeff_multistep(A, b8, canch8, starts, xt2, y2, z2, ys2,
                             av2, scalars, B: int,
                             precision: str = "highest", rs8=None,
                             interpret: bool = False):
    """K = len(starts) Katyusha inner block steps in one launch.
    ``scalars`` is the (1, 10) row [scale, α, β, αλ, βλ, 1/B, mode, τ₁,
    τ₂, aux]; ``xt2`` the (1, n) anchor point x̃; ``canch8`` its coefficient
    slab. Returns (y2, z2, ys2) after K momentum-coupled prox steps."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _katyusha_coeff_multi_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # anchor coeffs
            _bcast_spec((1, n)),                        # x̃
            _bcast_spec((1, n)),                        # y in
            _bcast_spec((1, n)),                        # z in
            _bcast_spec((1, n)),                        # ysum in
            _bcast_spec((1, n)),                        # av (read-only)
            pl.BlockSpec((1, 10), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((1, n)),                        # y out
            _bcast_spec((1, n)),                        # z out
            _bcast_spec((1, n)),                        # ysum out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # y carry
            pltpu.VMEM((1, n), jnp.float32),            # z carry
            pltpu.VMEM((1, n), jnp.float32),            # ysum carry
            pltpu.VMEM((1, n), jnp.float32),            # x eval point
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    y_new, z_new, ys_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, canch8, xt2, y2, z2, ys2,
      av2, scalars)
    return y_new, z_new, ys_new


def katyusha_inner_chunked(A, b8, canch8, xt2, y2, z2, ys2, av2, scalars,
                           B: int, m: int, starts_fn,
                           precision: str = "highest", rs8=None,
                           interpret: bool = False, launch_steps: int = 64):
    """Run ``floor(m/K)·K`` of a Katyusha inner loop as K-steps-per-
    launch kernels (same contract as ``svrg_inner_chunked``). Returns
    ``(y2, z2, ys2, done)``."""
    K = min(launch_steps, m)
    Lq = m // K

    def body(carry, q):
        y2, z2, ys2 = carry
        starts = starts_fn(q * K, K)
        y2, z2, ys2 = katyusha_coeff_multistep(
            A, b8, canch8, starts, xt2, y2, z2, ys2, av2, scalars, B,
            precision=precision, rs8=rs8, interpret=interpret,
        )
        return (y2, z2, ys2), None

    (y2, z2, ys2), _ = jax.lax.scan(
        body, (y2, z2, ys2), jnp.arange(Lq, dtype=jnp.int32)
    )
    return y2, z2, ys2, Lq * K


def _sarah_multi_kernel(ncols, prec, quant, starts_ref, A_ref, b_ref,
                        *refs):
    """K SARAH/ProxSARAH recursive inner block steps per launch. The
    recursion needs the live margin at w_t AND w_{t−1} over the same
    rows — both carried as the two rows of one (2, n) VMEM scratch and
    computed in ONE stacked (2, TILE) MXU dot per tile (the same
    two-margins-one-read trick as the TP stacked psum)."""
    if quant:
        (rs_ref, ww_in_ref, v_in_ref, sc_ref,
         ww_out_ref, v_out_ref, ww_vm, v_vm, innov_vm) = refs
    else:
        rs_ref = None
        (ww_in_ref, v_in_ref, sc_ref,
         ww_out_ref, v_out_ref, ww_vm, v_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # γ·λ (0 disables the prox: g = Zero)
    eta = sc_ref[0, 3]
    invB = sc_ref[0, 4]
    mode = sc_ref[0, 5]
    aux = sc_ref[0, 6]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        ww_vm[...] = ww_in_ref[...]   # rows: [w_prev; w]
        v_vm[...] = v_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r2 = _stream_dot(
        ww_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (2, TILE): row 0 = margins at w_prev, row 1 = at w
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]                 # (1, TILE)
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r2 = r2 * rs_t
    c2 = _coeff_formula(mode, r2, b_t, scale, aux)  # (2, TILE)
    dc = c2[1:2, :] - c2[0:1, :]                  # ∇f_i(w) − ∇f_i(w_prev)
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n)

    @pl.when(t == T - 1)
    def _():
        v_new = v_vm[...] + innov_vm[...] * invB  # the SARAH recursion
        w = ww_vm[1:2, :]
        yv = w - gamma * v_new
        y = jnp.sign(yv) * jnp.maximum(jnp.abs(yv) - thr, 0.0)
        w_next = w + eta * (y - w)                # ProxSARAH damping
        v_vm[...] = v_new
        ww_vm[0:1, :] = w
        ww_vm[1:2, :] = w_next

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        ww_out_ref[...] = ww_vm[...]
        v_out_ref[...] = v_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def sarah_multistep(A, b8, starts, ww2, v2, scalars, B: int,
                    precision: str = "highest", rs8=None,
                    interpret: bool = False):
    """K = len(starts) SARAH recursive block steps in one launch.
    ``ww2`` is the stacked (2, n) [w_prev; w] pair; ``v2`` the (1, n)
    recursive estimator; ``scalars`` the (1, 7) row
    [scale, γ, γλ, η, 1/B, mode, aux]. Returns (ww2, v2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _sarah_multi_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            _bcast_spec((2, n)),                        # [w_prev; w] in
            _bcast_spec((1, n)),                        # v in
            pl.BlockSpec((1, 7), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((2, n)),                        # [w_prev; w] out
            _bcast_spec((1, n)),                        # v out
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n), jnp.float32),            # [w_prev; w] carry
            pltpu.VMEM((1, n), jnp.float32),            # v carry
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    ww_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, ww2, v2, scalars)
    return ww_new, v_new


def sarah_inner_chunked(A, b8, ww2, v2, scalars, B: int, m: int,
                        starts_fn, precision: str = "highest", rs8=None,
                        interpret: bool = False, launch_steps: int = 64):
    """Run ``floor(m/K)·K`` of a SARAH inner loop as K-steps-per-launch
    kernels. Returns ``(ww2, v2, done)``."""
    K = min(launch_steps, m)
    Lq = m // K

    def body(carry, q):
        ww2, v2 = carry
        starts = starts_fn(q * K, K)
        ww2, v2 = sarah_multistep(
            A, b8, starts, ww2, v2, scalars, B,
            precision=precision, rs8=rs8, interpret=interpret,
        )
        return (ww2, v2), None

    (ww2, v2), _ = jax.lax.scan(
        body, (ww2, v2), jnp.arange(Lq, dtype=jnp.int32)
    )
    return ww2, v2, Lq * K


def _pointprox_theta(mode_static, mz, b_t, na_t, c_old, scale, gamma,
                     aux):
    """The per-row prox θ-solve, specialized statically on the
    oracle's coeff_mode: LSQ/Huber are closed forms, logistic is the
    20-step Newton of oracles.logistic._logistic_pointprox_theta
    (warm start θ₀ = the table coefficient)."""
    if mode_static == MODE_LOGISTIC:
        gna2 = gamma * na_t
        y_t = b_t

        def _newton(_, th):
            m = mz - gna2 * th
            s = jax.nn.sigmoid(-y_t * m)
            phi = th + y_t * s
            dphi = 1.0 + gna2 * s * (1.0 - s)
            return th - phi / dphi

        return jax.lax.fori_loop(0, 20, _newton, c_old)
    if mode_static == MODE_POISSON:
        # θ = scale·(exp(min(mz − γ‖a‖²θ, M)) − y): φ(θ) = θ − c(θ) is
        # increasing AND concave (φ' ≥ 1) — Newton is globally
        # convergent; the clamp keeps exp finite in f32
        gna2 = gamma * na_t
        y_t = b_t

        def _newton_poi(_, th):
            u = mz - gna2 * th
            e = jnp.exp(jnp.minimum(u, POISSON_CLAMP))
            phi = th - scale * (e - y_t)
            dphi = 1.0 + scale * gna2 * jnp.where(u <= POISSON_CLAMP, e, 0.0)
            return th - phi / dphi

        return jax.lax.fori_loop(0, 20, _newton_poi, c_old)
    if mode_static == MODE_SQHINGE:
        # active iff the deficit at the virtual point stays positive
        # (oracles.sqhinge._pointprox_core: the active-branch solution
        # keeps deficit/(1+scale·γ‖a‖²) > 0, so one test decides)
        y_t = b_t
        deficit = 1.0 - y_t * mz
        return jnp.where(
            deficit > 0,
            -scale * y_t * deficit / (1.0 + scale * gamma * na_t),
            jnp.zeros_like(mz),
        )
    theta_lsq = scale * (mz - b_t) / (1.0 + gamma * scale * na_t)
    if mode_static == MODE_HUBER:
        # the unclipped fixed point IS theta_lsq; one clip finishes it
        return jnp.clip(theta_lsq, -scale * aux, scale * aux)
    return theta_lsq


def _point_saga_multi_kernel(ncols, prec, quant, mode_static,
                             starts_ref, A_ref, b_ref, *refs):
    """K Point-SAGA block steps per launch. The per-row prox θ-solve is
    the closed least-squares form (``LeastSquaresRows._pointprox_core``)
    or, for logistic rows, the 20-step elementwise Newton of
    ``logistic._logistic_pointprox_theta`` — pure (1, TILE) VPU work,
    free next to the row stream. The coefficient table lives in VMEM
    scratch for the whole launch (hazard-free block revisits, like the
    SAGA slab); row square-norms stream like the offsets."""
    if quant:
        (rs_ref, na_ref, c_in_ref, x_in_ref, av_in_ref, sc_ref,
         c_out_ref, x_out_ref, av_out_ref,
         c_vm, x_vm, av_vm, u_vm) = refs
    else:
        rs_ref = None
        (na_ref, c_in_ref, x_in_ref, av_in_ref, sc_ref,
         c_out_ref, x_out_ref, av_out_ref,
         c_vm, x_vm, av_vm, u_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    invB = sc_ref[0, 2]
    invN = sc_ref[0, 3]
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        c_vm[...] = c_in_ref[...]
        x_vm[...] = x_in_ref[...]
        av_vm[...] = av_in_ref[...]

    @pl.when(t == 0)
    def _():
        u_vm[...] = jnp.zeros_like(u_vm)
        # x_vm holds the shared shifted iterate v = x − γ·ḡ for the step
        x_vm[...] = x_vm[...] - gamma * av_vm[...]

    A_t = A_ref[:]
    r = _stream_dot(
        x_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE) margins A_B·v
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    off = pl.multiple_of(abs_start % ncols, 128)
    b_t = b_ref[pl.ds(row, 1), :]
    na_t = na_ref[pl.ds(row, 1), :]               # dequant-corrected ‖a‖²
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_old = c_vm[pl.ds(row, 1), pl.ds(off, TILE)]
    mz = r + gamma * c_old * na_t
    # the θ-solve is specialized STATICALLY on the oracle's coeff_mode
    # (a dynamic select would run the 20-step logistic Newton's VPU
    # work for every mode — measured +25 % on the LSQ path)
    theta = _pointprox_theta(mode_static, mz, b_t, na_t, c_old, scale,
                             gamma, aux)
    c_vm[pl.ds(row, 1), pl.ds(off, TILE)] = theta
    w = c_old - theta
    if quant:
        w = w * rs_t
    u_vm[...] += _stream_dot(
        w, A_t, (((1,), (0,)), ((), ())), prec,
    )  # (1, n) Σ (c_j − θ_j)·a_j

    @pl.when(t == T - 1)
    def _():
        # x⁺ = v + (γ/B)·u ; ḡ⁺ = ḡ − u/N (exact table-mean delta)
        x_vm[...] = x_vm[...] + (gamma * invB) * u_vm[...]
        av_vm[...] = av_vm[...] - u_vm[...] * invN

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        c_out_ref[...] = c_vm[...]
        x_out_ref[...] = x_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "mode", "precision", "interpret"),
    donate_argnums=(3,),
)
def point_saga_multistep(A, b8, na8, c8, starts, x2, av2, scalars, B: int,
                         mode: int = 0, precision: str = "highest",
                         rs8=None, interpret: bool = False):
    """K = len(starts) Point-SAGA block steps in one launch. ``na8`` is
    the (8, N/8) slab of dequant-corrected row square-norms ‖a_i‖²
    (precomputed once at init — one pass); ``scalars`` the (1, 6) row
    [scale, γ, 1/B, 1/N, mode, aux] (mode selects the in-kernel
    θ-solve: MODE_LSQ/MODE_HUBER closed forms or MODE_LOGISTIC Newton;
    aux = Huber δ). Returns (c8, x2, av2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, _slab_reserve(N), esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _point_saga_multi_kernel, ncols, _PRECISIONS[precision], quant,
        mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # row sqnorms
            _bcast_spec((SLAB_ROWS, ncols)),            # c slab (whole)
            _bcast_spec((1, n)),                        # x in
            _bcast_spec((1, n)),                        # av in
            pl.BlockSpec((1, 6), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((SLAB_ROWS, ncols)),            # c slab out
            _bcast_spec((1, n)),                        # x out
            _bcast_spec((1, n)),                        # av out
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB_ROWS, ncols), jnp.float32),  # c carry
            pltpu.VMEM((1, n), jnp.float32),            # x / v carry
            pltpu.VMEM((1, n), jnp.float32),            # av carry
            pltpu.VMEM((1, n), jnp.float32),            # u accum
        ],
    )
    c_new, x_new, av_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((SLAB_ROWS, ncols), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops) + 1: 0},  # c slab in -> out
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, na8, c8, x2, av2, scalars)
    return c_new, x_new, av_new


def ssnm_multistep_streamed_available(N: int, n: int, B: int,
                                      dtype) -> bool:
    """Streamed-table SSNM gate: the SAGA streamed conditions PLUS the
    (d, n) stored-point table staying VMEM-resident (3 copies: in, out,
    scratch) — the large-N narrow-n regime (e.g. 10M×128: d·n f32 =
    655 KB)."""
    d = N // max(B, 1)
    return (
        coeff_multistep_streamed_available(N, n, B, dtype)
        and _pick_tile(B, N, n, 3 * d * n * 4,
                       esize=jnp.dtype(dtype).itemsize) >= 128
    )


def _ssnm_stream_kernel(prec, quant, starts_ref, A_ref, b_ref, *refs):
    """Streamed-table SSNM (any N): the SAGA stream kernel's window
    layout with the sampled-momentum math of _ssnm_multi_kernel; the
    (d, n) stored-point table stays VMEM-resident (gate above). Masked
    steps (k ≥ fclamp) must leave x, ḡ AND the redirected block's
    stored point untouched."""
    if quant:
        (rs_ref, c_in_ref, zb_in_ref, x_in_ref, gb_in_ref, sc_ref,
         c_out_ref, zb_out_ref, x_out_ref, gb_out_ref,
         zb_vm, x_vm, gb_vm, y_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, zb_in_ref, x_in_ref, gb_in_ref, sc_ref,
         c_out_ref, zb_out_ref, x_out_ref, gb_out_ref,
         zb_vm, x_vm, gb_vm, y_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    eta = sc_ref[0, 1]
    thr = sc_ref[0, 2]
    invB = sc_ref[0, 3]
    invN = sc_ref[0, 4]
    mode = sc_ref[0, 5]
    tau = sc_ref[0, 6]
    aux = sc_ref[0, 7]
    TILE = A_ref.shape[0]     # block id below = starts[k] // (T·TILE)
    fclamp = starts_ref[K]
    committed = k < fclamp

    @pl.when((k == 0) & (t == 0))
    def _():
        zb_vm[...] = zb_in_ref[...]
        x_vm[...] = x_in_ref[...]
        gb_vm[...] = gb_in_ref[...]

    @pl.when(t == 0)
    def _():
        j = starts_ref[k] // (T * TILE)           # block id
        y_vm[...] = (tau * x_vm[...]
                     + (1.0 - tau) * zb_vm[pl.ds(j, 1), :])
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(y_vm[...], A_t, (((1,), (1,)), ((), ())), prec)
    b_t = b_ref[:]                                  # (1, TILE)
    if quant:
        rs_t = rs_ref[:]
        r = r * rs_t
    c_old = c_in_ref[:]                             # streamed window
    c_new = jnp.where(committed,
                      _coeff_formula(mode, r, b_t, scale, aux), c_old)
    dc = c_new - c_old                              # 0 when masked
    c_out_ref[:] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(dc, A_t, (((1,), (0,)), ((), ())), prec)

    @pl.when(t == T - 1)
    def _():
        j = starts_ref[k] // (T * TILE)
        grad = innov_vm[...] * invB + gb_vm[...]   # ∇̃ (unbiased)
        xv = x_vm[...] - eta * grad                # MIRROR step from x
        x_vm[...] = jnp.where(
            committed,
            jnp.sign(xv) * jnp.maximum(jnp.abs(xv) - thr, 0.0),
            x_vm[...],
        )
        gb_vm[...] += innov_vm[...] * invN         # 0 delta when masked
        # φ_block ← y — NOT for a masked step (its j was redirected to
        # a real free block whose stored point must survive)
        zb_vm[pl.ds(j, 1), :] = jnp.where(
            committed, y_vm[...], zb_vm[pl.ds(j, 1), :]
        )

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        zb_out_ref[...] = zb_vm[...]
        x_out_ref[...] = x_vm[...]
        gb_out_ref[...] = gb_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3, 4),
)
def ssnm_multistep_streamed(A, b1, starts, c1, zb, x2, gb2, scalars,
                            B: int, precision: str = "highest",
                            rs1=None, f=None, interpret: bool = False):
    """K = len(starts) SSNM block steps with the (1, N) coefficient
    table STREAMED (donated, clamped launches) and the (d, n)
    stored-point table VMEM-resident (donated). ``scalars`` the (1, 8)
    row [scale, η, ηλ, 1/B, 1/N, mode, τ, aux]; ``f`` the clamp count.
    Returns (c1, zb, x2, gb2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    d = N // B
    TILE = _pick_tile(B, N, n, 3 * d * n * 4, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    if f is None:
        f = jnp.asarray(K, jnp.int32)
        starts = jnp.concatenate([starts.astype(jnp.int32), f[None]])
    else:
        starts = _redirect_masked(starts, f, B, N)

    def win_idx(k, t, st):
        return (0, st[k] // TILE + t)

    rs_specs = [pl.BlockSpec((1, TILE), win_idx)] if quant else []
    rs_ops = [rs1] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((1, TILE), win_idx),         # offsets b
            *rs_specs,                                # dequant scales
            pl.BlockSpec((1, TILE), win_idx),         # c window (in)
            _bcast_spec((d, n)),                      # zb (whole)
            _bcast_spec((1, n)),                      # x in
            _bcast_spec((1, n)),                      # gbar in
            pl.BlockSpec((1, 8), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), win_idx),         # c window (out)
            _bcast_spec((d, n)),                      # zb out
            _bcast_spec((1, n)),                      # x out
            _bcast_spec((1, n)),                      # gbar out
        ],
        scratch_shapes=[
            pltpu.VMEM((d, n), jnp.float32),          # zb carry
            pltpu.VMEM((1, n), jnp.float32),          # x carry
            pltpu.VMEM((1, n), jnp.float32),          # gbar carry
            pltpu.VMEM((1, n), jnp.float32),          # y (momentum pt)
            pltpu.VMEM((1, n), jnp.float32),          # innovation accum
        ],
    )
    c_new, zb_new, x_new, gb_new = pl.pallas_call(
        functools.partial(
            _ssnm_stream_kernel, _PRECISIONS[precision], quant
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((d, n), zb.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops): 0,     # c in -> out
                              4 + len(rs_ops): 1},    # zb in -> out
        interpret=interpret,
    )(starts, A, b1, *rs_ops, c1, zb, x2, gb2, scalars)
    return c_new, zb_new, x_new, gb_new


def finito_multistep_streamed_available(N: int, n: int, B: int,
                                        dtype) -> bool:
    """Streamed-table Finito-coeff gate: same residency shape as SSNM
    (streamed c + VMEM-resident (d, n) anchor table); the per-block
    Σ1/γ weights ride a second scalar-prefetch operand, so the SMEM
    d ≤ 1024 cap of the resident-slab kernel does not apply."""
    return ssnm_multistep_streamed_available(N, n, B, dtype)


def _finito_stream_kernel(prec, quant, starts_ref, invg_ref, A_ref,
                          b_ref, *refs):
    """Streamed-table Finito-basic coefficient steps (any N): the SAGA
    stream kernel's window layout with the Finito algebra of
    _finito_coeff_multi_kernel — the (d, n) per-block anchor table
    stays VMEM-resident, the per-block inverse-stepsize sums arrive
    pre-gathered per launch (``invg_ref``, scalar prefetch). Masked
    steps (k ≥ fclamp) leave av, z AND the redirected block's anchor
    untouched."""
    if quant:
        (rs_ref, c_in_ref, zb_in_ref, z_in_ref, av_in_ref, sc_ref,
         c_out_ref, zb_out_ref, z_out_ref, av_out_ref,
         zb_vm, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, zb_in_ref, z_in_ref, av_in_ref, sc_ref,
         c_out_ref, zb_out_ref, z_out_ref, av_out_ref,
         zb_vm, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    inv_n = sc_ref[0, 1]    # 1/N
    hat = sc_ref[0, 2]      # hat_γ
    thr = sc_ref[0, 3]      # hat_γ·λ (0 for g = Zero)
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]
    TILE = A_ref.shape[0]   # block id below = starts[k] // (T·TILE)
    fclamp = starts_ref[K]
    committed = k < fclamp

    @pl.when((k == 0) & (t == 0))
    def _():
        zb_vm[...] = zb_in_ref[...]
        av_vm[...] = av_in_ref[...]
        z_vm[...] = z_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(z_vm[...], A_t, (((1,), (1,)), ((), ())), prec)
    b_t = b_ref[:]                                  # (1, TILE)
    if quant:
        rs_t = rs_ref[:]
        r = r * rs_t
    c_old = c_in_ref[:]                             # streamed window
    c_new = jnp.where(committed,
                      _coeff_formula(mode, r, b_t, scale, aux), c_old)
    dc = c_new - c_old                              # 0 when masked
    c_out_ref[:] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(dc, A_t, (((1,), (0,)), ((), ())), prec)

    @pl.when(t == T - 1)
    def _():
        j = starts_ref[k] // (T * TILE)             # block id
        invg_j = invg_ref[k]                        # pre-gathered Σ1/γ
        zb_j = zb_vm[pl.ds(j, 1), :]
        z = z_vm[...]
        innov = hat * invg_j * (z - zb_j) - (hat * inv_n) * innov_vm[...]
        av = av_vm[...] + jnp.where(committed, innov, 0.0)
        av_vm[...] = av
        zb_vm[pl.ds(j, 1), :] = jnp.where(committed, z, zb_j)
        z_vm[...] = jnp.where(
            committed,
            jnp.sign(av) * jnp.maximum(jnp.abs(av) - thr, 0.0), z,
        )

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        zb_out_ref[...] = zb_vm[...]
        z_out_ref[...] = z_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(4, 5),
)
def finito_coeff_multistep_streamed(A, b1, starts, invg_k, c1, zb, z2,
                                    av2, scalars, B: int,
                                    precision: str = "highest",
                                    rs1=None, f=None,
                                    interpret: bool = False):
    """K = len(starts) coefficient-mode Finito-basic block steps with
    the (1, N) coefficient table STREAMED (donated, clamped launches)
    and the (d, n) anchor table VMEM-resident (donated). ``invg_k`` is
    the (K,) pre-gathered per-block Σ1/γ aligned with ``starts``;
    ``scalars`` the (1, 6) row [scale, 1/N, hat_γ, hat_γ·λ, mode, aux];
    ``f`` the clamp count. Returns (c1, zb, z2, av2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    d = N // B
    TILE = _pick_tile(B, N, n, 3 * d * n * 4, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    if f is None:
        f = jnp.asarray(K, jnp.int32)
        starts = jnp.concatenate([starts.astype(jnp.int32), f[None]])
    else:
        starts = _redirect_masked(starts, f, B, N)

    def win_idx(k, t, st, *p):
        return (0, st[k] // TILE + t)

    rs_specs = [pl.BlockSpec((1, TILE), win_idx)] if quant else []
    rs_ops = [rs1] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n),
                         lambda k, t, st, *p: (st[k] // TILE + t, 0)),
            pl.BlockSpec((1, TILE), win_idx),         # offsets b
            *rs_specs,                                # dequant scales
            pl.BlockSpec((1, TILE), win_idx),         # c window (in)
            _bcast_spec((d, n)),                      # zb (whole)
            _bcast_spec((1, n)),                      # z in
            _bcast_spec((1, n)),                      # av in
            pl.BlockSpec((1, 6), lambda k, t, st, *p: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), win_idx),         # c window (out)
            _bcast_spec((d, n)),                      # zb out
            _bcast_spec((1, n)),                      # z out
            _bcast_spec((1, n)),                      # av out
        ],
        scratch_shapes=[
            pltpu.VMEM((d, n), jnp.float32),          # zb carry
            pltpu.VMEM((1, n), jnp.float32),          # av carry
            pltpu.VMEM((1, n), jnp.float32),          # z carry
            pltpu.VMEM((1, n), jnp.float32),          # innovation accum
        ],
    )
    c_new, zb_new, z_new, av_new = pl.pallas_call(
        functools.partial(
            _finito_stream_kernel, _PRECISIONS[precision], quant
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((d, n), zb.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={4 + len(rs_ops): 0,     # c in -> out
                              5 + len(rs_ops): 1},    # zb in -> out
        interpret=interpret,
    )(starts, invg_k.astype(jnp.float32), A, b1, *rs_ops, c1, zb, z2,
      av2, scalars)
    return c_new, zb_new, z_new, av_new


def _point_saga_stream_kernel(prec, quant, mode_static, starts_ref,
                              A_ref, b_ref, *refs):
    """Streamed-table Point-SAGA (any N): the SAGA stream kernel's
    window layout with the Point-SAGA θ-solve — see
    _point_saga_multi_kernel for the math and _saga_stream_kernel for
    the clamp/masking contract."""
    if quant:
        (rs_ref, na_ref, c_in_ref, x_in_ref, av_in_ref, sc_ref,
         c_out_ref, x_out_ref, av_out_ref, x_vm, av_vm, u_vm) = refs
    else:
        rs_ref = None
        (na_ref, c_in_ref, x_in_ref, av_in_ref, sc_ref,
         c_out_ref, x_out_ref, av_out_ref, x_vm, av_vm, u_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    invB = sc_ref[0, 2]
    invN = sc_ref[0, 3]
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]       # oracle formula parameter (Huber δ)
    fclamp = starts_ref[K]
    committed = k < fclamp

    @pl.when((k == 0) & (t == 0))
    def _():
        x_vm[...] = x_in_ref[...]
        av_vm[...] = av_in_ref[...]

    @pl.when(t == 0)
    def _():
        u_vm[...] = jnp.zeros_like(u_vm)
        # shared shifted iterate v = x − γ·ḡ — masked steps must leave
        # x untouched (their u stays 0, so the t==T−1 un-shift would
        # otherwise leave x at v)
        x_vm[...] = jnp.where(committed,
                              x_vm[...] - gamma * av_vm[...], x_vm[...])

    A_t = A_ref[:]
    r = _stream_dot(x_vm[...], A_t, (((1,), (1,)), ((), ())), prec)
    b_t = b_ref[:]                                  # (1, TILE)
    na_t = na_ref[:]                                # (1, TILE) ‖a‖²
    if quant:
        rs_t = rs_ref[:]
        r = r * rs_t
    c_old = c_in_ref[:]
    mz = r + gamma * c_old * na_t
    theta = _pointprox_theta(mode_static, mz, b_t, na_t, c_old, scale,
                             gamma, aux)
    theta = jnp.where(committed, theta, c_old)
    c_out_ref[:] = theta
    w = c_old - theta                               # 0 when masked
    if quant:
        w = w * rs_t
    u_vm[...] += _stream_dot(w, A_t, (((1,), (0,)), ((), ())), prec)

    @pl.when(t == T - 1)
    def _():
        # x⁺ = v + (γ/B)·u ; ḡ⁺ = ḡ − u/N (both no-ops when masked)
        x_vm[...] = x_vm[...] + (gamma * invB) * u_vm[...]
        av_vm[...] = av_vm[...] - u_vm[...] * invN

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        x_out_ref[...] = x_vm[...]
        av_out_ref[...] = av_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "mode", "precision", "interpret"),
    donate_argnums=(3,),
)
def point_saga_multistep_streamed(A, b1, na1, c1, starts, x2, av2,
                                  scalars, B: int, mode: int = 0,
                                  precision: str = "highest", rs1=None,
                                  f=None, interpret: bool = False):
    """K = len(starts) Point-SAGA block steps with the (1, N)
    coefficient table STREAMED (donated) — serves any N (the
    saga_coeff_multistep_streamed layout with the θ-solve in-kernel).
    ``b1``/``na1``/``c1``/``rs1`` are (1, N) rows; ``scalars`` the
    (1, 6) row [scale, γ, 1/B, 1/N, mode, aux]; ``f`` the clamp count.
    Returns (c1, x2, av2)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs1 is not None), "rs1 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    if f is None:
        f = jnp.asarray(K, jnp.int32)
        starts = jnp.concatenate([starts.astype(jnp.int32), f[None]])
    else:
        starts = _redirect_masked(starts, f, B, N)

    def win_idx(k, t, st):
        return (0, st[k] // TILE + t)

    rs_specs = [pl.BlockSpec((1, TILE), win_idx)] if quant else []
    rs_ops = [rs1] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((1, TILE), win_idx),         # offsets b
            *rs_specs,                                # dequant scales
            pl.BlockSpec((1, TILE), win_idx),         # row sqnorms
            pl.BlockSpec((1, TILE), win_idx),         # c window (in)
            _bcast_spec((1, n)),                      # x in
            _bcast_spec((1, n)),                      # av in
            pl.BlockSpec((1, 6), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), win_idx),         # c window (out)
            _bcast_spec((1, n)),                      # x out
            _bcast_spec((1, n)),                      # av out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),          # x / v carry
            pltpu.VMEM((1, n), jnp.float32),          # av carry
            pltpu.VMEM((1, n), jnp.float32),          # u accum
        ],
    )
    c_new, x_new, av_new = pl.pallas_call(
        functools.partial(
            _point_saga_stream_kernel, _PRECISIONS[precision], quant,
            mode,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops) + 1: 0},  # c in -> out
        interpret=interpret,
    )(starts, A, b1, *rs_ops, na1, c1, x2, av2, scalars)
    return c_new, x_new, av_new


# ---------------------------------------------------------------------------
# loopless fused kernels: L-SVRG / L-Katyusha (coin-aware multi-step)
# ---------------------------------------------------------------------------
#
# The loopless families interleave SVRG-type block steps with Bernoulli
# anchor jumps. The coins are stateless (key, it) draws, so the DRIVER
# knows each launch's first-flip position BEFORE launching: it clamps
# the block schedule at that position (tail grid steps re-read the last
# processed block — bounded waste, see solvers/lsvrg.py) and passes the
# stop index as a second scalar-prefetch operand; the kernel masks all
# state updates past it. The anchor refresh (a full pass) then runs
# OUTSIDE the kernel under lax.cond, and the next launch resumes from
# the post-flip step with the new anchor slab.


def _lsvrg_coeff_multi_kernel(ncols, prec, quant, starts_ref, stop_ref,
                              A_ref, b_ref, *refs):
    """Up to K L-SVRG block steps per launch (the SVRG inner update —
    same math as ``_svrg_coeff_multi_kernel`` without the iterate
    averaging), masked past ``stop``; also records the PRE-update
    iterate of the last processed step (the anchor-jump target)."""
    if quant:
        (rs_ref, canch_ref, w_in_ref, av_ref, sc_ref,
         w_out_ref, wpre_out_ref, w_vm, wpre_vm, innov_vm) = refs
    else:
        rs_ref = None
        (canch_ref, w_in_ref, av_ref, sc_ref,
         w_out_ref, wpre_out_ref, w_vm, wpre_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    stop = stop_ref[0]
    scale = sc_ref[0, 0]
    gamma = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # γ·λ (0 disables the prox: g = Zero)
    invB = sc_ref[0, 3]
    mode = sc_ref[0, 4]
    aux = sc_ref[0, 5]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        w_vm[...] = w_in_ref[...]
        wpre_vm[...] = w_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        w_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE)
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_live = _coeff_formula(mode, r, b_t, scale, aux)
    c_anch = canch_ref[pl.ds(row, 1), :]
    dc = c_anch - c_live                     # ∇f_i(z) − ∇f_i(w)
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )

    @pl.when((t == T - 1) & (k <= stop))
    def _():
        w = w_vm[...]
        wpre_vm[...] = w                     # pre-update iterate
        wv = w + gamma * (innov_vm[...] * invB - av_ref[...])
        w_vm[...] = jnp.sign(wv) * jnp.maximum(jnp.abs(wv) - thr, 0.0)

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        w_out_ref[...] = w_vm[...]
        wpre_out_ref[...] = wpre_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def lsvrg_coeff_multistep(A, b8, canch8, starts, stop, w2, av2, scalars,
                          B: int, precision: str = "highest", rs8=None,
                          interpret: bool = False):
    """``stop + 1`` L-SVRG block steps in one launch (the (K,) schedule
    ``starts`` must be clamped past ``stop`` by the caller). ``scalars``
    is the (1, 6) row [scale, γ, γλ, 1/B, mode, aux]. Returns
    ``(w2, wpre2)`` — the post-launch iterate and the last processed
    step's PRE-update iterate (the anchor-jump target)."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st, sp):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _lsvrg_coeff_multi_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n),
                         lambda k, t, st, sp: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # anchor coeffs
            _bcast_spec((1, n)),                        # w in
            _bcast_spec((1, n)),                        # av (read-only)
            pl.BlockSpec((1, 6), lambda k, t, st, sp: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((1, n)),                        # w out
            _bcast_spec((1, n)),                        # w_pre out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # w carry
            pltpu.VMEM((1, n), jnp.float32),            # w_pre carry
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    w_new, wpre = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), jnp.reshape(stop, (1,)).astype(jnp.int32),
      A, b8, *rs_ops, canch8, w2, av2, scalars)
    return w_new, wpre


def _lkatyusha_coeff_multi_kernel(ncols, prec, quant, starts_ref, stop_ref,
                                  A_ref, b_ref, *refs):
    """Up to K L-Katyusha block steps per launch: eval point
    x = θ₁z + θ₂w + (1−θ₁−θ₂)y formed in VMEM, the proximal z-update
    and the y coupling in-kernel, masked past ``stop``; records the
    PRE-update y of the last processed step (the anchor-jump target)."""
    if quant:
        (rs_ref, canch_ref, wa_ref, y_in_ref, z_in_ref, av_ref, sc_ref,
         y_out_ref, z_out_ref, ypre_out_ref,
         y_vm, z_vm, ypre_vm, x_vm, innov_vm) = refs
    else:
        rs_ref = None
        (canch_ref, wa_ref, y_in_ref, z_in_ref, av_ref, sc_ref,
         y_out_ref, z_out_ref, ypre_out_ref,
         y_vm, z_vm, ypre_vm, x_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    stop = stop_ref[0]
    scale = sc_ref[0, 0]
    step = sc_ref[0, 1]      # η/L
    tau_thr = sc_ref[0, 2]   # τ·λ (0 disables the prox: g = Zero)
    invdenom = sc_ref[0, 3]  # 1/(1 + ησ̂)
    etasig = sc_ref[0, 4]    # η·σ̂
    th1 = sc_ref[0, 5]
    th2 = sc_ref[0, 6]
    invB = sc_ref[0, 7]
    mode = sc_ref[0, 8]
    aux = sc_ref[0, 9]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]

    @pl.when((k == 0) & (t == 0))
    def _():
        y_vm[...] = y_in_ref[...]
        z_vm[...] = z_in_ref[...]
        ypre_vm[...] = y_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)
        x_vm[...] = (th1 * z_vm[...] + th2 * wa_ref[...]
                     + (1.0 - th1 - th2) * y_vm[...])

    A_t = A_ref[:]
    r = _stream_dot(
        x_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    b_t = b_ref[pl.ds(row, 1), :]
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_live = _coeff_formula(mode, r, b_t, scale, aux)
    c_anch = canch_ref[pl.ds(row, 1), :]
    dc = c_live - c_anch                     # ∇f_i(x) − ∇f_i(w)
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )

    @pl.when((t == T - 1) & (k <= stop))
    def _():
        gr = av_ref[...] + innov_vm[...] * invB     # ∇̃
        zv = (z_vm[...] + etasig * x_vm[...] - step * gr) * invdenom
        z_new = jnp.sign(zv) * jnp.maximum(jnp.abs(zv) - tau_thr, 0.0)
        ypre_vm[...] = y_vm[...]                    # pre-update y
        y_vm[...] = x_vm[...] + th1 * (z_new - z_vm[...])
        z_vm[...] = z_new

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        y_out_ref[...] = y_vm[...]
        z_out_ref[...] = z_vm[...]
        ypre_out_ref[...] = ypre_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
)
def lkatyusha_coeff_multistep(A, b8, canch8, starts, stop, wa2, y2, z2,
                              av2, scalars, B: int,
                              precision: str = "highest", rs8=None,
                              interpret: bool = False):
    """``stop + 1`` L-Katyusha block steps in one launch. ``wa2`` is the
    (1, n) anchor point w; ``scalars`` the (1, 10) row
    [scale, η/L, τλ, 1/(1+ησ̂), ησ̂, θ₁, θ₂, 1/B, mode, aux]. Returns
    ``(y2, z2, ypre2)``."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    TILE = _pick_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st, sp):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    kernel = functools.partial(
        _lkatyusha_coeff_multi_kernel, ncols, _PRECISIONS[precision], quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n),
                         lambda k, t, st, sp: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # anchor coeffs
            _bcast_spec((1, n)),                        # anchor point w
            _bcast_spec((1, n)),                        # y in
            _bcast_spec((1, n)),                        # z in
            _bcast_spec((1, n)),                        # av (read-only)
            pl.BlockSpec((1, 10), lambda k, t, st, sp: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((1, n)),                        # y out
            _bcast_spec((1, n)),                        # z out
            _bcast_spec((1, n)),                        # y_pre out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # y carry
            pltpu.VMEM((1, n), jnp.float32),            # z carry
            pltpu.VMEM((1, n), jnp.float32),            # y_pre carry
            pltpu.VMEM((1, n), jnp.float32),            # x eval point
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    y_new, z_new, ypre = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), jnp.reshape(stop, (1,)).astype(jnp.int32),
      A, b8, *rs_ops, canch8, wa2, y2, z2, av2, scalars)
    return y_new, z_new, ypre


# ---------------------------------------------------------------------------
# fused ProShI block steps (sharing formulation, streamed block table)
# ---------------------------------------------------------------------------
#
# ProShI's per-step work (ProShI_basic.jl:111-123) is table-dominated:
# read the block's s rows, one POINTWISE rank-1 gradient per row at
# s_tmp = s_i + γ_i·z, write the new rows, update av/z — 3 table-sized
# HBM transfers per step (s in, s out, A in). The XLA path pays ~2x the
# floor (measured 0.159 vs 0.083 ms at 65k×1024, B=4096); this kernel
# runs K steps per launch with av/z carried in VMEM and the (N, n)
# table STREAMED tile-by-tile through input/output aliasing.
#
# Hazard contract: the APPLIED steps of a launch must visit DISTINCT
# blocks — a same-launch revisit would race the streamed write-back
# (unlike the coefficient kernels, the table cannot live in VMEM).
# CYCLIC sweeping satisfies this for any K ≤ d window and runs
# unclamped; SHUFFLED and RANDOM (block-sampling) schedules pass a
# clamp count ``f`` from sampling.gen_block_ids_clamped — the first
# same-launch duplicate position — and the kernel masks steps k >= f
# (their tiles are redirected by the wrapper to a block with no
# committed visit, so the identity write-back cannot race). The driver
# (solvers/proshi.py) advances the schedule by f only.

def proshi_multistep_available(N: int, n: int, B: int, dtype) -> bool:
    return (
        runtime.on_tpu()
        and jnp.dtype(dtype) == jnp.float32
        and n % 128 == 0
        and _proshi_tile(B, N, n) >= 8
    )


def _proshi_tile(B: int, N: int, n: int, esize: int = 4) -> int:
    """Working set per grid step ≈ double-buffered (A tile + s in tile
    + s out tile); the coefficient kernels' 6-buffer model with the s
    traffic added."""
    budget_rows = 16_646_144 // (2 * (esize + 8) * max(n, 1))
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if t <= budget_rows and B % t == 0 and N % t == 0:
            return t
    return 0


# coupling prox modes (scalar ``gmode``)
GPROX_ZERO = 0   # g = Zero: prox = id → z ≡ 0
GPROX_BOX = 1    # IndBox[glo, ghi]: prox = clip
GPROX_L1 = 2     # NormL1: soft-threshold at glo = hat·λ


def _proshi_multi_kernel(prec, quant, starts_ref, A_ref, b_ref, g_ref,
                         *refs):
    if quant:
        (rs_ref, s_ref, av_in_ref, z_in_ref, sc_ref,
         s_out_ref, av_out_ref, z_out_ref, av_vm, z_vm, innov_vm) = refs
    else:
        rs_ref = None
        (s_ref, av_in_ref, z_in_ref, sc_ref,
         s_out_ref, av_out_ref, z_out_ref, av_vm, z_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    invN = sc_ref[0, 1]
    invhat = sc_ref[0, 2]
    mode = sc_ref[0, 3]
    glo = sc_ref[0, 4]
    ghi = sc_ref[0, 5]
    gmode = sc_ref[0, 6]
    aux = sc_ref[0, 7]       # oracle formula parameter (Huber δ)
    # clamp count (trailing prefetch slot): steps k >= fclamp are MASKED
    # — their (rewritten, conflict-free) tiles stream through unchanged
    # and contribute no innovation. The driver commits only fclamp steps
    # of the schedule (gen_block_ids_clamped); the cyclic caller passes
    # fclamp = K (no masking).
    fclamp = starts_ref[K]
    committed = k < fclamp

    @pl.when((k == 0) & (t == 0))
    def _():
        av_vm[...] = av_in_ref[...]
        z_vm[...] = z_in_ref[...]

    @pl.when(t == 0)
    def _():
        innov_vm[...] = jnp.zeros_like(innov_vm)

    s_old = s_ref[:]                                  # (TILE, n)
    gi = g_ref[:]                                     # (TILE, 1)
    s_tmp = s_old + gi * z_vm[...]                    # + γ_i·z
    A_f = A_ref[:].astype(jnp.float32)                # exact for bf16/int8
    m = jnp.sum(A_f * s_tmp, axis=1, keepdims=True)   # pointwise margins
    b_t = b_ref[:]                                    # (TILE, 1)
    if quant:
        rs_t = rs_ref[:]                              # (TILE, 1)
        m = m * rs_t
    c = _coeff_formula(mode, m, b_t, scale, aux)      # (TILE, 1)
    w = (gi * invN) * c
    if quant:
        w = w * rs_t
    s_new = jnp.where(committed, s_tmp - w * A_f, s_old)
    innov_vm[...] += jnp.sum(s_new - s_old, axis=0, keepdims=True)
    s_out_ref[:] = s_new

    @pl.when(t == T - 1)
    def _():
        av = av_vm[...] + innov_vm[...]
        p_box = jnp.clip(av, glo, ghi)
        p_l1 = jnp.sign(av) * jnp.maximum(jnp.abs(av) - glo, 0.0)
        p = jnp.where(gmode == GPROX_BOX, p_box,
                      jnp.where(gmode == GPROX_L1, p_l1, av))
        av_vm[...] = av
        z_vm[...] = (p - av) * invhat

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        av_out_ref[...] = av_vm[...]
        z_out_ref[...] = z_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3,),
)
def proshi_multistep(A, b2, g2, s, starts, av2, z2, scalars, B: int,
                     precision: str = "highest", rs2=None,
                     interpret: bool = False, f=None):
    """K = len(starts) ProShI block steps in one launch over K DISTINCT
    blocks (caller's contract — see the hazard note above). ``b2``/
    ``g2`` are the (N, 1) offset/γ columns; ``s`` the donated (N, n)
    block table; ``scalars`` the (1, 8) row
    [scale, 1/N, 1/hat_γ, mode, glo, ghi, gmode, aux]. Returns
    ``(s, av2, z2)``.

    ``f`` (optional clamp count, traced int32 scalar): only the first
    ``f`` steps of the schedule are APPLIED — the shuffled/random fused
    drivers clamp each launch at the first same-launch block revisit
    (gen_block_ids_clamped). Masked steps are redirected to a FREE
    block (one with no committed visit, which exists whenever f < K
    <= d) so their identity write-back cannot race a committed write,
    and the kernel zeroes their innovation."""
    N, n = s.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs2 is not None), "rs2 required iff rows are int8"
    TILE = _proshi_tile(B, N, n, esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    if f is None:
        f = jnp.asarray(K, jnp.int32)
        starts = jnp.concatenate(
            [starts.astype(jnp.int32), f[None]]
        )
    else:
        starts = _redirect_masked(starts, f, B, N)

    def row_idx(k, t, st):
        return (st[k] // TILE + t, 0)

    rs_specs = [pl.BlockSpec((TILE, 1), row_idx)] if quant else []
    rs_ops = [rs2] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), row_idx),           # A rows
            pl.BlockSpec((TILE, 1), row_idx),           # b col
            pl.BlockSpec((TILE, 1), row_idx),           # γ col
            *rs_specs,                                  # dequant col
            pl.BlockSpec((TILE, n), row_idx),           # s rows (in)
            _bcast_spec((1, n)),                        # av in
            _bcast_spec((1, n)),                        # z in
            pl.BlockSpec((1, 8), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, n), row_idx),           # s rows (out)
            _bcast_spec((1, n)),                        # av out
            _bcast_spec((1, n)),                        # z out
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),            # av carry
            pltpu.VMEM((1, n), jnp.float32),            # z carry
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    s_new, av_new, z_new = pl.pallas_call(
        functools.partial(
            _proshi_multi_kernel, _PRECISIONS[precision], quant
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, n), s.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={4 + len(rs_ops): 0},      # s in -> s out
        interpret=interpret,
    )(starts, A, b2, g2, *rs_ops, s, av2, z2, scalars)
    return s_new, av_new, z_new


# ---------------------------------------------------------------------------
# fused SSNM (SAGA with sampled negative momentum) multi-step kernel
# ---------------------------------------------------------------------------
#
# SSNM's step is the SAGA coefficient step evaluated at the momentum
# point y = τ·x + (1−τ)·φ_block instead of the iterate — so the kernel
# is the SAGA slab kernel plus the Finito coefficient kernel's (d, n)
# per-block eval-point table (both VMEM-resident for the launch;
# same-block revisits hazard-free).

def _ssnm_multi_kernel(prec, quant, starts_ref, A_ref, b_ref, *refs):
    if quant:
        (rs_ref, c_in_ref, zb_in_ref, x_in_ref, gb_in_ref, sc_ref,
         c_out_ref, zb_out_ref, x_out_ref, gb_out_ref,
         c_vm, zb_vm, x_vm, gb_vm, y_vm, innov_vm) = refs
    else:
        rs_ref = None
        (c_in_ref, zb_in_ref, x_in_ref, gb_in_ref, sc_ref,
         c_out_ref, zb_out_ref, x_out_ref, gb_out_ref,
         c_vm, zb_vm, x_vm, gb_vm, y_vm, innov_vm) = refs
    k = pl.program_id(0)
    t = pl.program_id(1)
    K = pl.num_programs(0)
    T = pl.num_programs(1)
    scale = sc_ref[0, 0]
    eta = sc_ref[0, 1]
    thr = sc_ref[0, 2]       # η·λ (0 disables the prox: g = Zero)
    invB = sc_ref[0, 3]
    invN = sc_ref[0, 4]
    mode = sc_ref[0, 5]
    tau = sc_ref[0, 6]
    aux = sc_ref[0, 7]       # oracle formula parameter (Huber δ)
    TILE = A_ref.shape[0]
    ncols = c_vm.shape[1]

    @pl.when((k == 0) & (t == 0))
    def _():
        c_vm[...] = c_in_ref[...]
        zb_vm[...] = zb_in_ref[...]
        x_vm[...] = x_in_ref[...]
        gb_vm[...] = gb_in_ref[...]

    @pl.when(t == 0)
    def _():
        j = starts_ref[k] // (T * TILE)           # block id
        y_vm[...] = (tau * x_vm[...]
                     + (1.0 - tau) * zb_vm[pl.ds(j, 1), :])
        innov_vm[...] = jnp.zeros_like(innov_vm)

    A_t = A_ref[:]
    r = _stream_dot(
        y_vm[...], A_t, (((1,), (1,)), ((), ())), prec,
    )  # (1, TILE) margins at the momentum point
    abs_start = starts_ref[k] + t * TILE
    row = abs_start // ncols
    off = pl.multiple_of(abs_start % ncols, 128)
    b_t = b_ref[pl.ds(row, 1), :]
    if quant:
        rs_t = rs_ref[pl.ds(row, 1), :]
        r = r * rs_t
    c_new = _coeff_formula(mode, r, b_t, scale, aux)
    c_old = c_vm[pl.ds(row, 1), pl.ds(off, TILE)]
    dc = c_new - c_old
    c_vm[pl.ds(row, 1), pl.ds(off, TILE)] = c_new
    if quant:
        dc = dc * rs_t
    innov_vm[...] += _stream_dot(
        dc, A_t, (((1,), (0,)), ((), ())), prec,
    )

    @pl.when(t == T - 1)
    def _():
        j = starts_ref[k] // (T * TILE)
        y = y_vm[...]
        grad = innov_vm[...] * invB + gb_vm[...]   # ∇̃ (unbiased)
        xv = x_vm[...] - eta * grad                # MIRROR step from x
        x_vm[...] = jnp.sign(xv) * jnp.maximum(jnp.abs(xv) - thr, 0.0)
        gb_vm[...] += innov_vm[...] * invN         # exact table mean
        zb_vm[pl.ds(j, 1), :] = y                  # φ_block ← y

    @pl.when((k == K - 1) & (t == T - 1))
    def _():
        c_out_ref[...] = c_vm[...]
        zb_out_ref[...] = zb_vm[...]
        x_out_ref[...] = x_vm[...]
        gb_out_ref[...] = gb_vm[...]


@functools.partial(
    jax.jit, static_argnames=("B", "precision", "interpret"),
    donate_argnums=(3, 4),
)
def ssnm_multistep(A, b8, starts, c8, zb, x2, gb2, scalars, B: int,
                   precision: str = "highest", rs8=None,
                   interpret: bool = False):
    """K = len(starts) SSNM block steps in one launch. ``c8`` is the
    coefficient slab and ``zb`` the (d, n) stored-point table (both
    VMEM-resident for the launch — the Finito coefficient kernel's
    budget); ``scalars`` the (1, 8) row
    [scale, η, ηλ, 1/B, 1/N, mode, τ, aux]. Returns
    ``(c8, zb, x2, gb2)``."""
    N, n = A.shape
    quant = A.dtype == jnp.int8
    assert quant == (rs8 is not None), "rs8 required iff rows are int8"
    d = N // B
    TILE = _pick_tile(B, N, n, _slab_reserve(N) + 3 * d * n * 4,
                      esize=A.dtype.itemsize)
    T = B // TILE
    K = starts.shape[0]
    ncols = N // SLAB_ROWS

    def slab_idx(k, t, st):
        a = st[k] + t * TILE
        return (0, (a % ncols) // TILE)

    rs_specs = [pl.BlockSpec((SLAB_ROWS, TILE), slab_idx)] if quant else []
    rs_ops = [rs8] if quant else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((TILE, n), lambda k, t, st: (st[k] // TILE + t, 0)),
            pl.BlockSpec((SLAB_ROWS, TILE), slab_idx),  # offsets b
            *rs_specs,                                  # dequant scales
            _bcast_spec((SLAB_ROWS, ncols)),            # c slab (whole)
            _bcast_spec((d, n)),                        # zb (whole)
            _bcast_spec((1, n)),                        # x in
            _bcast_spec((1, n)),                        # gbar in
            pl.BlockSpec((1, 8), lambda k, t, st: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _bcast_spec((SLAB_ROWS, ncols)),            # c slab out
            _bcast_spec((d, n)),                        # zb out
            _bcast_spec((1, n)),                        # x out
            _bcast_spec((1, n)),                        # gbar out
        ],
        scratch_shapes=[
            pltpu.VMEM((SLAB_ROWS, ncols), jnp.float32),  # c carry
            pltpu.VMEM((d, n), jnp.float32),            # zb carry
            pltpu.VMEM((1, n), jnp.float32),            # x carry
            pltpu.VMEM((1, n), jnp.float32),            # gbar carry
            pltpu.VMEM((1, n), jnp.float32),            # y (momentum pt)
            pltpu.VMEM((1, n), jnp.float32),            # innovation accum
        ],
    )
    c_new, zb_new, x_new, gb_new = pl.pallas_call(
        functools.partial(
            _ssnm_multi_kernel, _PRECISIONS[precision], quant
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((SLAB_ROWS, ncols), jnp.float32),
            jax.ShapeDtypeStruct((d, n), zb.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        input_output_aliases={3 + len(rs_ops): 0,       # c slab
                              4 + len(rs_ops): 1},      # zb table
        interpret=interpret,
    )(starts.astype(jnp.int32), A, b8, *rs_ops, c8, zb, x2, gb2, scalars)
    return c_new, zb_new, x_new, gb_new
