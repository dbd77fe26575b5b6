"""Large-N Lasso on one chip: the low-memory LFinito path.

The reference's answer to N beyond table capacity is LFinito
(O(n) state, 2 gradient evals per sample per epoch,
``Finito_LFinito.jl``); the TPU build runs each epoch as two fused
streaming passes over the row matrix (PERF.md). 2M×1024 rows (8 GB in
f32) fit one v5e chip and sustain ~540 GB/s effective:

    python examples/large_scale_lasso.py          # real TPU
    python examples/large_scale_lasso.py bf16     # bf16-stored rows:
                                                  # half the traffic,
                                                  # ~2x the epoch rate
"""

import time

import jax
import jax.numpy as jnp

from ciao_tpu.oracles import LeastSquaresRows
from ciao_tpu.prox import NormL1
from ciao_tpu.solvers.finito import FinitoCfg, finito_run, lfinito_init


def main(N=2_097_152, n=1_024, B=4_096, epochs=20, storage="f32"):
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = jax.random.normal(kA, (N, n), jnp.float32)
    b = jax.random.normal(kb, (N,), jnp.float32)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32))
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    # keep the Lipschitz pass fused — an eager A*A materializes 8 GB
    L = jax.jit(lambda A: jnp.sum(A * A, axis=1) * N)(A)
    if storage == "bf16":
        F = F.with_storage()   # state/coefficients stay f32 (PERF.md)

    cfg = FinitoCfg(N=N, batch=B, sweeping=3, alpha=0.999, fused=True)
    st = lfinito_init(F, g, jnp.zeros(n, jnp.float32), 0.999 * N / L, key, cfg)
    jax.block_until_ready(st)

    st = finito_run(F, g, st, cfg, "lfinito", 1)   # compile
    _ = float(st.z[0])
    t0 = time.perf_counter()
    st = finito_run(F, g, st, cfg, "lfinito", epochs)
    _ = float(st.z[0])
    dt = time.perf_counter() - t0
    bpe = F.A.dtype.itemsize
    print(f"N={N:,} n={n} [{storage}]: {dt / epochs * 1e3:.1f} ms/epoch "
          f"({epochs * 2 * N * n * bpe / dt / 1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    import sys

    main(storage="bf16" if "bf16" in sys.argv[1:] else "f32")
