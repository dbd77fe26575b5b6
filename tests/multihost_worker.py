"""Worker half of the 2-process jax.distributed test (NOT collected by
pytest — no ``test_`` prefix; driven by ``tests/test_multihost.py``).

One copy runs per process. Env (set by the launcher BEFORE interpreter
start, since the container's sitecustomize imports jax at startup):
  JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>
Argv: <coordinator_port> <process_id> <num_processes> <outdir>

Exercises the SURVEY §2.3 comm-backend component the reference lacks
(single serial process, Finito.jl:122-128): ``jax.distributed.initialize``
over a local CPU cluster (gloo collectives = the DCN stand-in), a GLOBAL
mesh spanning both processes, and DP solvers whose per-step psum crosses
the process boundary. Process 0 writes the solutions to <outdir> for the
parent to compare bit-exact against a single-process 8-device run.
"""

import sys

import jax

port, pid, nproc, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ciao_tpu.oracles import LeastSquaresRows  # noqa: E402
from ciao_tpu.parallel import (  # noqa: E402
    DPSAGA, TPSAGA, make_mesh, make_mesh_2d, shard_finite_sum,
    shard_finite_sum_2d,
)
from ciao_tpu.prox import NormL1  # noqa: E402
from ciao_tpu.utils.problems import make_lasso  # noqa: E402


def main():
    assert jax.process_count() == nproc
    D = len(jax.devices())
    N, n = 16 * D, 32
    prob = make_lasso(N=N, n=n, p=4, seed=0)

    mesh = make_mesh()  # all GLOBAL devices on "data"
    F = shard_finite_sum(
        LeastSquaresRows(
            A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
            scale=jnp.asarray(float(N)),
        ),
        mesh,
    )
    g = NormL1(lam=jnp.asarray(prob.lam))
    x0 = jnp.zeros(n)

    results = {}
    # lockstep DP: one x-sized psum per step, riding the gloo process
    # boundary here (DCN on a real pod)
    x, iters = DPSAGA(mesh=mesh, batch=D, block_sampling=True, maxit=400)(
        x0, F=F, g=g, L=prob.L
    )
    results["lockstep"] = np.asarray(jax.device_get(x))

    # local-update mode: K fused-round local steps per collective
    x, steps = DPSAGA(
        mesh=mesh, batch=D, block_sampling=True,
        local_steps=8, rebase_every=16, maxit=50,
    )(x0, F=F, g=g, L=prob.L)
    results["local"] = np.asarray(jax.device_get(x))

    # tensor-parallel on a (D/2, 2) GLOBAL mesh: the per-step "model"
    # margin psum and the "data" innovation psum both cross the process
    # boundary (coordinates of x owned by different processes)
    mesh2 = make_mesh_2d(D // 2, 2)
    F2 = shard_finite_sum_2d(
        LeastSquaresRows(
            A=jnp.asarray(prob.A), b=jnp.asarray(prob.b),
            scale=jnp.asarray(float(N)),
        ),
        mesh2,
    )
    x, _ = TPSAGA(mesh=mesh2, batch=D, maxit=400)(x0, F=F2, g=g, L=prob.L)
    results["tp"] = np.asarray(jax.device_get(x))

    # the deep-accuracy plan over the CROSS-PROCESS mesh: local-update
    # DPSAGA chunks, sharded-oracle power bound, DP-FISTA compensated
    # polish — every stage's collectives ride the process boundary.
    # plateau_rtol=-1 pins the chunk count (the host-side plateau
    # decision must not knife-edge on reduction order across runs).
    from ciao_tpu.parallel import deep_solve_dp

    prob_wc = make_lasso(N=N, n=n, p=4, seed=0, dtype=np.float32,
                         well_conditioned=True)
    F32 = shard_finite_sum(
        LeastSquaresRows(
            A=jnp.asarray(prob_wc.A, jnp.float32),
            b=jnp.asarray(prob_wc.b, jnp.float32),
            scale=jnp.asarray(float(N), jnp.float32),
        ),
        mesh,
    )
    xd, _ = deep_solve_dp(
        jnp.zeros(n, jnp.float32), F32,
        NormL1(lam=jnp.asarray(prob_wc.lam, jnp.float32)), L=prob_wc.L,
        N=N, mesh=mesh, batch=D, local_steps=8, chunk_rounds=32,
        max_rounds=256, plateau_rtol=-1.0, polish_steps=8,
        polish_chunk=4,
    )
    results["deep"] = np.asarray(jax.device_get(xd))

    if jax.process_index() == 0:
        gap = float(prob.cost(results["lockstep"]) - prob.f_star)
        rel_deep = float(
            (prob_wc.cost(results["deep"].astype(np.float64))
             - prob_wc.f_star) / abs(prob_wc.f_star))
        np.savez(f"{outdir}/multihost_out.npz", gap=gap,
                 rel_deep=rel_deep, **results)
    # all processes must reach this point together (the npz write above
    # only happens after both processes' collectives completed)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
