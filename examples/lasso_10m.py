"""The BASELINE.json headline problem: a 10M×100 Lasso on one chip.

BASELINE.json's metric is "epochs/s and time-to-target suboptimality on
Lasso 10M×100" (the reference publishes nothing; the ≥5× target is vs
its single-core loop). Design note (see also ``oracles/sparse.py``):
at n = 100 the TPU-native layout is DENSE rows padded to the 128-lane
boundary — the MXU and the DMA engines read 128 lanes regardless, so
sparsity below one lane-width saves nothing, and the fused streaming
kernels apply unchanged. A = 10.5M × 128 f32 is 5.4 GB (2.7 GB bf16)
and fits one v5e chip.

The solver is LFinito — the reference's own answer to N beyond table
capacity (O(n) state, ``Finito_LFinito.jl``) — running each epoch as
two fused streaming passes; plus the SAGA coefficient path for
per-step numbers (its (N,) coefficient table is 40 MB here; the fused
multi-step kernel's VMEM slab caps at N ≤ 1M, so SAGA runs the
stepwise-XLA block path at this N).

    python examples/lasso_10m.py          # f32
    python examples/lasso_10m.py bf16     # bf16-stored rows, ~2x
    python examples/lasso_10m.py int8     # int8-stored rows, ~3x
"""

import sys
import time

import jax
import jax.numpy as jnp

from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers.finito import FinitoCfg, finito_run, lfinito_init


def main(N=10 * 1024 * 1024, n=128, B=8_192, epochs=12, storage="f32",
         small=False):
    if small:  # CI smoke shapes (tests/test_examples.py): same code path
        N, B, epochs = 8_192, 512, 2
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)

    # n=100 problem, zero-padded to 128 lanes (the padding columns carry
    # zeros: same math, MXU-aligned layout). Generation, padding mask and
    # the optional bf16 cast are ONE fused jit so only a single A-sized
    # buffer ever exists (A is 5.4 GB f32 — an eager mask would copy it).
    out_dt = jnp.bfloat16 if storage == "bf16" else jnp.float32

    @jax.jit
    def gen(kA):
        a = jax.random.normal(kA, (N, n), jnp.float32)
        a = a * (jnp.arange(n) < 100).astype(jnp.float32)[None, :]
        if storage == "int8":
            # quantize INSIDE the generating jit so the f32 A never
            # leaves the fusion (int8 A is 1.35 GB vs f32's 5.4)
            from ciao_tpu.oracles.base import quantize_rows

            q, rs = quantize_rows(a)
            return q, rs, jnp.sum(a * a, axis=1) * N
        return a.astype(out_dt), None, jnp.sum(a * a, axis=1) * N

    A, rs, L = gen(kA)
    b = jax.random.normal(kb, (N,), jnp.float32)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32),
                         row_scale=rs)
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))

    cfg = FinitoCfg(N=N, batch=B, sweeping=3, alpha=0.999,
                    fused=jax.default_backend() == "tpu")
    st = lfinito_init(F, g, jnp.zeros(n, jnp.float32), 0.999 * N / L, key, cfg)
    jax.block_until_ready(st)

    if not small:
        # size the timed scan so it runs ~0.5 s: through the axon tunnel
        # a dispatch + scalar readback costs ~2-30 ms, so short runs
        # (e.g. 4 epochs of a small-N problem) report mostly overhead
        est_epoch_s = 2 * N * n * A.dtype.itemsize / 4.5e11
        epochs = max(epochs, min(512, int(0.5 / est_epoch_s) + 1))

    # warm the TIMED shape (a steps=1 warmup would leave the steps=epochs
    # scan to compile inside the clock)
    st = finito_run(F, g, st, cfg, "lfinito", epochs)
    _ = float(st.z[0])
    t0 = time.perf_counter()
    st = finito_run(F, g, st, cfg, "lfinito", epochs)
    _ = float(st.z[0])
    dt = time.perf_counter() - t0
    bpe = F.A.dtype.itemsize
    print(f"LFinito {N:,}x100 (pad 128) [{storage}]: "
          f"{dt / epochs * 1e3:.1f} ms/epoch = {epochs / dt:.1f} epochs/s "
          f"({epochs * 2 * N * n * bpe / dt / 1e9:.0f} GB/s effective; "
          f"single-core CPU loop ~42k samples/s would need "
          f"~{N / 42_000:.0f}s/epoch)")
    # the epochs actually optimized (on-device objective read). F is a
    # jit ARGUMENT — closing over it would ship the multi-GB operator
    # as a remote-compile constant through the axon tunnel (hangs)
    obj = jax.jit(lambda F, z: jnp.real(F.value_sum_all(z)) / N
                  + 0.1 * jnp.sum(jnp.abs(z)))
    o0 = float(obj(F, jnp.zeros(n, jnp.float32)))
    oz = float(obj(F, st.z))
    assert jnp.isfinite(st.z).all()
    assert oz < o0, f"LFinito must decrease the objective ({oz} vs {o0})"


if __name__ == "__main__":
    _stor = "f32"
    for _s in ("bf16", "int8"):
        if _s in sys.argv[1:]:
            _stor = _s
    main(storage=_stor)
