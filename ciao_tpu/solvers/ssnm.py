"""SSNM — SAGA with Sampled Negative Momentum (BEYOND the reference).

Zhou, Shang, Cheng, "Direct Acceleration of SAGA using Sampled Negative
Momentum" (AISTATS 2019; PAPERS.md): Katyusha-class acceleration,
O((N + √(Nκ))·log 1/ε), with a far LIGHTER state than Katyusha — no
three-sequence coupling and no outer loop; the negative momentum comes
from the SAMPLED term's own stored point:

    sample block j;   y_k = τ·x_k + (1−τ)·φ_j
    ∇̃  = ∇f_j(y_k) − ∇f_j(φ_j) + ḡ         ḡ = (1/N) Σ_i ∇f_i(φ_i)
    x_{k+1} = prox_{ηg}(x_k − η ∇̃)          η = 1/(3·τ·L) (mirror step)
    φ_j ← y_k

x plays Katyusha's MIRROR-sequence role: the gradient (evaluated at
the momentum point y) steps from x with the 1/τ-scaled stepsize —
exactly Katyusha's α = 1/(3τ₁L) coupling with the y-sequence replaced
by the sampled stored point. At τ = 1 this is verbatim minibatch SAGA.

TPU mapping — the reason SSNM is a natural fit here: for rank-1 row
gradients the stored ∇f_i(φ_i) compress to the (N,) coefficient table,
so ``∇f_j(y) − ∇f_j(φ_j)`` IS the SAGA innovation Σ(c(y)_i − c_i)·a_i —
one block row read, one margin dot, one apply dot — and the sampled
points φ live as the per-BLOCK eval-point table ``zb (d, n)`` exactly
like the Finito coefficient state (uniform contiguous-block sampling:
a block's rows always share their last update point). Per step the
whole method costs the fused SAGA step plus one O(n) convex
combination. Single-loop, constant-shape state: checkpoints and
shards like SAGA's.

Tuning: τ defaults to ½ (measured ~10¹⁰× past SAGA at a matched
16k-step budget on the ill-conditioned planted lasso — tests pin ≥50×);
σ sets the Katyusha-style τ = min(½, √(N·σ/(3·L_max))) when given.
η defaults to the coupled 1/(3·τ·L_max). At τ = 1 the method
degenerates to exactly minibatch SAGA (y ≡ x), which the tests pin
bit-for-bit.

API matches the reference-style facades: ``SSNM(...)(x0, F=F, g=g,
L=L, N=N)`` and ``.iterator(...)``; solution(state) = x.
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


class SSNMCfg(NamedTuple):
    N: int
    batch: int = 1
    fused: bool = False  # Pallas K-steps-per-launch kernel
    fused_precision: str = "highest"  # MXU dots in fused kernels
    # streamed-table fused kernel (any N): (1, N) coefficient row
    # through clamped aliased windows, the (d, n) stored-point table
    # VMEM-resident (the saga fused_stream machinery)
    fused_stream: bool = False


class SSNMState(NamedTuple):
    tau: jnp.ndarray     # scalar momentum weight
    eta: jnp.ndarray     # scalar stepsize
    c: jnp.ndarray       # (N,) coefficient table c_i = c(φ_i)
    zb: jnp.ndarray      # (d, n) per-block stored points φ
    gbar: jnp.ndarray    # (n,) table mean ḡ = (1/N) Σ c_i·a_i
    x: jnp.ndarray       # (n,) iterate
    key: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray

    @property
    def solution(self):
        return self.x


@partial(jax.jit, static_argnames=("cfg",))
def ssnm_init(F, g, x0, tau, eta, key, cfg: SSNMCfg) -> SSNMState:
    """Table bootstrap φ_i = x0 (SAGA convention): coefficients at x0,
    ḡ their mean, every block's stored point x0; x = x0 so
    solution(init) == x0."""
    c = F.coeff_all(x0)
    gbar = F.apply_all(c) / cfg.N
    d = cfg.N // cfg.batch
    zb = jnp.broadcast_to(x0, (d,) + x0.shape)
    return SSNMState(
        tau=tau, eta=eta, c=c, zb=zb, gbar=gbar, x=x0, key=key,
        it=jnp.ones((), jnp.int32), status=jnp.zeros((), jnp.int32),
    )


def _ssnm_step(F, g, cfg: SSNMCfg, state: SSNMState) -> SSNMState:
    """One SSNM step on a uniformly-drawn contiguous block (the same
    stateless (key, it) stream as fused/stepwise SAGA)."""
    from ciao_tpu.solvers.saga import _block_start

    N, B = cfg.N, cfg.batch
    tau, eta = state.tau, state.eta
    start = _block_start(state.key, state.it, N, B)
    j = start // B
    phi = state.zb[j]                                  # (n,) stored point
    y = tau * state.x + (1.0 - tau) * phi              # sampled momentum
    c_new = F.coeff_block(y, start, B)
    c_old = jax.lax.dynamic_slice_in_dim(state.c, start, B)
    innov = F.apply_rows_block(c_new - c_old, start, B)
    grad = innov / B + state.gbar                      # ∇̃ (unbiased)
    x = g.prox_only(state.x - eta * grad, eta)         # mirror step
    gbar = state.gbar + innov / N                      # exact table mean
    c = jax.lax.dynamic_update_slice_in_dim(state.c, c_new, start, 0)
    zb = state.zb.at[j].set(y)                         # φ_block ← y
    return state._replace(c=c, zb=zb, gbar=gbar, x=x, it=state.it + 1)


def _ssnm_run_fused(F, g, state, cfg: SSNMCfg, steps: int):
    """Fused multi-step driver: K block steps per Pallas launch
    (ops.ssnm_multistep — the coefficient slab AND the (d, n) stored-
    point table carried in VMEM, like the Finito coefficient kernel;
    the sampled-momentum combination, direction, and prox in-kernel).
    Sampling stream ≡ the stepwise path (vectorized
    ``_gen_block_starts``)."""
    from ciao_tpu.ops.fused_block import (
        SLAB_ROWS, oracle_scalar_consts, rows_scale_slab, ssnm_multistep,
    )
    from ciao_tpu.solvers.saga import _gen_block_starts

    B = cfg.batch
    K = min(128, steps)
    L = steps // K
    rem = steps - L * K
    rows, offs = F.coeff_rows_data()
    scale, mode, lam, aux = oracle_scalar_consts(F, g)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    scalars = jnp.stack([
        scale, f32(state.eta), f32(state.eta * lam), f32(1.0 / B),
        f32(1.0 / cfg.N), mode, f32(state.tau), aux,
    ])[None, :]
    slab = (SLAB_ROWS, cfg.N // SLAB_ROWS)
    b8 = offs.reshape(slab)
    rs8 = rows_scale_slab(F)

    def body(carry, it0):
        c8, zb, x2, gb2 = carry
        starts = _gen_block_starts(state.key, it0, cfg, K)
        c8, zb, x2, gb2 = ssnm_multistep(
            rows, b8, starts, c8, zb, x2, gb2, scalars, B,
            precision=cfg.fused_precision, rs8=rs8,
        )
        return (c8, zb, x2, gb2), None

    its0 = state.it + K * jnp.arange(L, dtype=jnp.int32)
    (c8, zb, x2, gb2), _ = jax.lax.scan(
        body,
        (state.c.reshape(slab), state.zb, state.x[None, :],
         state.gbar[None, :]),
        its0,
    )
    state = state._replace(
        c=c8.reshape(cfg.N), zb=zb, x=x2[0], gbar=gb2[0],
        it=state.it + jnp.asarray(L * K, jnp.int32),
    )
    for _ in range(rem):
        state = _ssnm_step(F, g, cfg, state)
    return state


def _ssnm_run_fused_streamed(F, g, state, cfg: SSNMCfg, steps: int):
    """Any-N fused driver: the (1, N) coefficient row streams through
    clamped launches (ops.ssnm_multistep_streamed) with the (d, n)
    stored-point table VMEM-resident — the saga fused_stream machinery
    with the sampled-momentum math in-kernel."""
    from ciao_tpu.ops.fused_block import (
        oracle_scalar_consts, rows_scale_row, ssnm_multistep_streamed,
    )
    from ciao_tpu.sampling import first_duplicate
    from ciao_tpu.solvers.saga import (
        _gen_block_starts, run_clamped_stream, stream_launch_K,
    )

    B, N = cfg.batch, cfg.N
    K = stream_launch_K(N // B)
    rows, offs = F.coeff_rows_data()
    b1 = offs[None, :]
    rs1 = rows_scale_row(F)
    scale, mode, lam, aux = oracle_scalar_consts(F, g)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    scalars = jnp.stack([
        scale, f32(state.eta), f32(state.eta * lam), f32(1.0 / B),
        f32(1.0 / N), mode, f32(state.tau), aux,
    ])[None, :]
    interp = jax.default_backend() != "tpu"

    def launch(carry):
        c1, zb, x2, gb2, it = carry
        starts = _gen_block_starts(state.key, it, cfg, K)
        fcl = first_duplicate(starts // B)
        c1, zb, x2, gb2 = ssnm_multistep_streamed(
            rows, b1, starts, c1, zb, x2, gb2, scalars, B,
            precision=cfg.fused_precision, rs1=rs1, f=fcl,
            interpret=interp,
        )
        return (c1, zb, x2, gb2, it + fcl)

    return run_clamped_stream(
        state, steps, K,
        (state.c[None, :], state.zb, state.x[None, :],
         state.gbar[None, :]), launch,
        lambda st, c: st._replace(c=c[0][0], zb=c[1], x=c[2][0],
                                  gbar=c[3][0], it=c[4]),
        lambda st: _ssnm_step(F, g, cfg, st),
    )


@partial(jax.jit, static_argnames=("cfg", "steps"))
def ssnm_run(F, g, state, cfg: SSNMCfg, steps: int):
    if cfg.fused and steps >= 8:
        return _ssnm_run_fused(F, g, state, cfg, steps)
    if cfg.fused_stream and steps >= 8:
        return _ssnm_run_fused_streamed(F, g, state, cfg, steps)

    def body(s, _):
        with jax.named_scope("ssnm_step"):
            return _ssnm_step(F, g, cfg, s), None

    return jax.lax.scan(body, state, None, length=steps)[0]


@partial(jax.jit, static_argnames=("cfg",))
def ssnm_step(F, g, state, cfg: SSNMCfg):
    return _ssnm_step(F, g, cfg, state)


@partial(jax.jit, static_argnames=("cfg",))
def ssnm_rebase(F, g, state, cfg: SSNMCfg):
    """Recompute ḡ exactly from the coefficient table under ``F``'s row
    storage — required after a storage swap (cf. saga_rebase)."""
    return state._replace(gbar=F.apply_all(state.c) / cfg.N)


@dataclasses.dataclass(frozen=True)
class SSNM:
    """SAGA with sampled negative momentum (beyond the reference).

    ``sigma`` — strong-convexity modulus of f (per-term average); sets
    τ = min(½, √(N·σ/(3·L_max))). Without it τ defaults to ½ (pass
    ``tau`` explicitly for problem-specific schedules; τ = 1 is exactly
    minibatch SAGA). ``eta`` defaults to 1/(3·L_max). ``maxit`` counts
    steps of ``batch`` rows (contiguous blocks — the TPU fast path is
    the only sampling mode; N must divide by batch)."""

    maxit: int = 10000
    verbose: bool = False
    freq: int = 1000
    batch: int = 1
    tau: Optional[float] = None
    sigma: Optional[float] = None
    eta: Optional[float] = None
    fused_precision: str = "highest"  # "default" = bf16-mul/f32-acc dots
    seed: int = 0

    def __post_init__(self):
        assert self.maxit > 0 and self.freq > 0 and self.batch >= 1
        assert self.fused_precision in ("highest", "default")
        if self.tau is not None:
            assert 0.0 < self.tau <= 1.0
        assert self.eta is None or self.eta > 0

    def _setup(self, x0, F, g, L, N):
        x0 = jnp.asarray(x0)
        if N is None:
            if F is None:
                raise ValueError("provide F or N")
            N = F.num_terms
        if g is None:
            g = Zero()
        if not getattr(F, "supports_coeff", False):
            raise ValueError(
                "SSNM stores the sampled points per BLOCK, which needs a "
                f"rank-1 (coefficient) oracle; {type(F).__name__} is not"
            )
        if N % self.batch != 0:
            raise ValueError("SSNM needs N divisible by batch")
        rdt = real_dtype_of(x0)
        if L is None and (self.eta is None or (self.tau is None
                                               and self.sigma is not None)):
            raise ValueError("SSNM: provide the smoothness moduli L, or η/τ")
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
        fused = False
        fused_stream = False
        if self.batch > 1 and x0.dtype == jnp.float32:
            from ciao_tpu.ops import finito_multistep_available
            from ciao_tpu.ops.fused_block import (
                ssnm_multistep_streamed_available,
            )
            from ciao_tpu.prox import NormL1

            # the kernel carries the coefficient slab AND the (d, n)
            # stored-point table in VMEM — the Finito-coeff budget
            kernel_ok = (
                hasattr(F, "coeff_rows_data")
                and isinstance(g, (NormL1, Zero))
            )
            fused = kernel_ok and finito_multistep_available(
                N, x0.size, self.batch, x0.dtype
            )
            # beyond the slab cap: streamed c, zb stays VMEM-resident
            fused_stream = (
                kernel_ok and not fused
                and ssnm_multistep_streamed_available(
                    N, x0.size, self.batch, x0.dtype
                )
            )
        if self.batch > 1 and not (fused or fused_stream):
            from ciao_tpu.solvers.base import warn_fused_gate_fallback

            warn_fused_gate_fallback("SSNM", F, g, x0)
        cfg = SSNMCfg(N=N, batch=self.batch, fused=fused,
                      fused_stream=fused_stream,
                      fused_precision=self.fused_precision)
        key = jax.random.PRNGKey(self.seed)
        init = lambda: ssnm_init(F, g, x0, tau, eta, key, cfg)
        return x0, F, g, cfg, init

    def __call__(self, x0, F=None, g=None, L=None, N=None, observe=None):
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)

        def run_chunk(state, k):
            return ssnm_run(F, g, state, cfg, k)

        def disp(it, state):
            print(f"{it:5d} | {float(state.tau):.3e}")

        state, it = run_solver_loop(
            init, run_chunk, self.maxit, self.verbose, self.freq, disp,
            observe,
        )
        return state.solution, it

    def iterator(self, x0, F=None, g=None, L=None, N=None):
        x0_orig = x0
        x0, F, g, cfg, init = self._setup(x0, F, g, L, N)
        step = lambda s: ssnm_step(F, g, s, cfg)
        rebase = lambda s: ssnm_rebase(F, g, s, cfg)
        return SolverIterable(x0_orig, init, step, rebase_fn=rebase)
