#!/usr/bin/env python
"""Headline benchmark — SAGA epoch throughput on a large dense Lasso.

The reference publishes no performance numbers (BASELINE.md): its
functional tests are tiny (N=6..8) and its runtime is a single-process
Julia loop doing one sample per iteration (``SAGA_basic.jl:53-67``).
The baseline here is therefore a faithful single-core CPU (numpy/BLAS)
implementation of that batch-1 SAGA loop, measured in samples/s; the
TPU build runs the algorithmically-sanctioned minibatch variant (the
reference's own TODO at ``SAGA_basic.jl:74``) with the (N, n) gradient
table HBM-resident and the whole step jitted + scanned on device.

Prints ONE JSON line:
  {"metric": "saga_samples_per_s", "value": ..., "unit": "samples/s",
   "vs_baseline": <tpu samples/s ÷ cpu-loop samples/s>}
Details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# problem size (fits one v5e chip: A 1 GB + table 1 GB in f32)
# ---------------------------------------------------------------------------
N, n = 262_144, 1_024
BATCH = 4_096
STEPS_PER_EPOCH = N // BATCH
WARMUP_EPOCHS = 2
# Through the axon tunnel one dispatch costs ~2-30 ms; time enough work
# (65k steps ≈ 0.43 s on-device even on the fastest int8 path) that the
# headline reflects step time, not dispatch amortization (at 128
# epochs the int8 path was only ~75 ms of work and the dispatch cost
# showed up as ±20 % run-to-run).
TIMED_EPOCHS = 1024

# CPU baseline gets a smaller N (same n) and extrapolates per-sample time.
N_CPU, CPU_STEPS = 16_384, 20_000


def cpu_baseline_samples_per_s() -> float:
    """Batch-1 SAGA loop (the reference's algorithm, SAGA_basic.jl:53-67)
    in numpy — per-sample cost is O(n) BLAS-1 ops, matching the Julia
    reference's in-place broadcast profile."""
    rng = np.random.default_rng(0)
    A = rng.standard_normal((N_CPU, n), dtype=np.float32)
    b = rng.standard_normal(N_CPU).astype(np.float32)
    L_max = float((A * A).sum(axis=1).max() * N_CPU)
    gamma = np.float32(1.0 / (3.0 * L_max))
    lam = np.float32(0.1)
    idx = rng.integers(0, N_CPU, size=CPU_STEPS)

    def one_run():
        s = np.zeros((N_CPU, n), np.float32)      # gradient table
        av = np.zeros(n, np.float32)
        z = np.zeros(n, np.float32)
        t0 = time.perf_counter()
        for k in range(CPU_STEPS):
            i = idx[k]
            a = A[i]
            r = a @ z - b[i]
            grad = (N_CPU * r) * a                # scale = N (reference)
            diff = grad - s[i]
            w = z - gamma * (diff + av)
            av += diff / N_CPU
            z[:] = np.sign(w) * np.maximum(np.abs(w) - gamma * lam, 0)
            s[i] = grad
        return time.perf_counter() - t0

    # best-of-3: the host is shared, and a single run's rate swung
    # 23k-44k samples/s between benchmark invocations — the FASTEST run
    # is the honest single-core capability (transient load only slows)
    dt = min(one_run() for _ in range(3))
    return CPU_STEPS / dt


def tpu_samples_per_s(storage: str = "int8") -> float:
    """Headline configuration: coefficient tables + K-steps-per-launch
    fused kernel + int8-STORED oracle rows (``with_storage("int8")`` —
    the kernels are HBM-bound, so quarter-width rows with per-row
    dequant scales are the fastest storage; iterates/coefficients stay
    f32 and the steps are exact SAGA on the quantized operator Ã, which
    tracks the bf16 trajectory (PERF.md) — deeper targets take the
    staged int8→f32 schedule timed in ``bench_secondary``, with
    ``saga_rebase`` at the storage switch).
    ``storage="bf16"`` halves instead of quarters the traffic
    (~0.0129 ms/step vs int8's ~0.0065); ``storage="f32"`` measures the
    exact-f32 path (bit-level trajectory of the stepwise reference
    algorithm; ~0.028 ms/step)."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = jax.random.normal(kA, (N, n), jnp.float32)
    b = jax.random.normal(kb, (N,), jnp.float32)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32))
    if storage != "f32":
        F = F.with_storage(storage)
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    L_max = jnp.max(jnp.sum(A * A, axis=1)) * N
    gamma = (1.0 / (3.0 * L_max)).astype(jnp.float32)
    # block sampling + coefficient-compressed table + K-steps-per-launch
    # fused Pallas kernel: the TPU-native fast path (trajectory exactly
    # equals the full-table variant; tests/test_ops.py equivalence suite)
    from ciao_tpu.ops import coeff_multistep_available

    fused = coeff_multistep_available(N, n, BATCH, jnp.float32)
    cfg = SAGACfg(N=N, sag=False, batch=BATCH, block=True, coeff=True, fused=fused)

    state = saga_init(F, g, jnp.zeros(n, jnp.float32), gamma, key, cfg)
    jax.block_until_ready(state)

    obj0 = float(
        0.5 * jnp.sum((A @ state.z - b) ** 2) + 0.1 * jnp.sum(jnp.abs(state.z))
    )

    t_compile = time.perf_counter()
    state = saga_run(F, g, state, cfg, STEPS_PER_EPOCH)
    jax.block_until_ready(state)
    log(f"compile+first epoch: {time.perf_counter() - t_compile:.1f}s")

    timed_steps = TIMED_EPOCHS * STEPS_PER_EPOCH
    state = saga_run(F, g, state, cfg, timed_steps)  # compile timed shape
    _ = float(state.z[0])                            # hard sync (tunnel-safe)

    t0 = time.perf_counter()
    state = saga_run(F, g, state, cfg, timed_steps)
    _ = float(state.z[0])
    dt = time.perf_counter() - t0

    obj1 = float(
        0.5 * jnp.sum((A @ state.z - b) ** 2) + 0.1 * jnp.sum(jnp.abs(state.z))
    )
    log(f"objective {obj0:.4e} -> {obj1:.4e} (must decrease)")
    assert obj1 < obj0, "solver is not making progress"

    samples = TIMED_EPOCHS * STEPS_PER_EPOCH * BATCH
    step_ms = dt / (TIMED_EPOCHS * STEPS_PER_EPOCH) * 1e3
    log(
        f"TPU [{storage} storage]: {samples / dt:,.0f} samples/s  "
        f"({TIMED_EPOCHS / dt:.2f} epochs/s, {step_ms:.3f} ms/step, "
        f"batch={BATCH}, N={N}, n={n})"
    )
    return samples / dt


def bench_secondary():
    """CIAO_BENCH_ALL=1: also time the fused Finito/LFinito/SVRG paths
    (stderr only — the driver consumes the single stdout JSON line)."""
    import time

    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.finito import (
        FinitoCfg,
        finito_coeff_init,
        finito_run,
        lfinito_init,
    )
    from ciao_tpu.solvers.svrg import SVRGCfg, svrg_init, svrg_run

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = jax.random.normal(kA, (N, n), jnp.float32)
    b = jax.random.normal(kb, (N,), jnp.float32)
    F32 = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32))
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    L = jnp.sum(A * A, axis=1) * N
    x0 = jnp.zeros(n, jnp.float32)
    # long scans: at 60 epochs the int8 paths are only ~100 ms of work
    # and the ~2-30 ms tunnel dispatch showed up as ±20 % run-to-run
    EP = 150
    m = STEPS_PER_EPOCH

    for tag, F in (("f32", F32), ("bf16", F32.with_storage()),
                   ("int8", F32.with_storage("int8"))):
        cfg = FinitoCfg(N=N, batch=BATCH, sweeping=3, alpha=0.999, fused=True)
        st = finito_coeff_init(F, g, x0, 0.999 * N / L, key, cfg)
        steps = 256 * STEPS_PER_EPOCH
        st2 = finito_run(F, g, st, cfg, "basic_coeff", steps)
        _ = float(st2.z[0])
        t0 = time.perf_counter()
        st2 = finito_run(F, g, st, cfg, "basic_coeff", steps)
        _ = float(st2.z[0])
        dt = time.perf_counter() - t0
        log(f"finito fused [{tag}]: {steps * BATCH / dt / 1e6:.1f} M samples/s "
            f"({dt / steps * 1e3:.4f} ms/step)")

        st = lfinito_init(F, g, x0, 0.999 * N / L, key, cfg)
        st2 = finito_run(F, g, st, cfg, "lfinito", EP)
        _ = float(st2.z[0])
        t0 = time.perf_counter()
        st2 = finito_run(F, g, st, cfg, "lfinito", EP)
        _ = float(st2.z[0])
        dt = time.perf_counter() - t0
        log(f"lfinito fused [{tag}]: {dt / EP * 1e3:.2f} ms/epoch "
            f"({EP * 2 * N / dt / 1e6:.1f} M grad-evals/s)")

        scfg = SVRGCfg(N=N, plus=False, batch=BATCH, block=True, fused=True,
                       m_fused=m)
        gam = (1.0 / (10.0 * jnp.max(L))).astype(jnp.float32)
        st = svrg_init(F, g, x0, gam, m, key, scfg)
        st2 = svrg_run(F, g, st, scfg, EP)
        _ = float(st2.z_full[0])
        t0 = time.perf_counter()
        st2 = svrg_run(F, g, st, scfg, EP)
        _ = float(st2.z_full[0])
        dt = time.perf_counter() - t0
        log(f"svrg fused [{tag}]: {dt / EP * 1e3:.2f} ms/outer "
            f"({EP * (2 * m * BATCH + N) / dt / 1e6:.1f} M grad-evals/s)")

    # time-to-target suboptimality on a planted-optimum Lasso.
    #
    # Target = rel 1e-3. Two facts (measured, PERF.md) shape this
    # benchmark: (a) the f32 fixed-point floor on this problem is rel
    # ~1.4e-4, so sub-1e-4 targets are unreachable in f32 — an earlier
    # version of this benchmark recorded a "time-to-1e-6" that was in
    # fact the exhausted-budget wall time; (b) the reference's planted
    # generator is catastrophically ill-conditioned at large n (column
    # norms spread ~1000x), so the capped ``well_conditioned`` variant
    # is used — same KKT-planted optimum, bounded column spread.
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_rebase, saga_run
    from ciao_tpu.utils.problems import make_lasso

    Np, npx = 65_536, 1_024
    prob = make_lasso(N=Np, n=npx, p=64, seed=0, dtype=jnp.float32,
                      well_conditioned=True)
    Ap = jnp.asarray(prob.A, jnp.float32)
    bp = jnp.asarray(prob.b, jnp.float32)
    Fp = LeastSquaresRows(A=Ap, b=bp, scale=jnp.asarray(float(Np), jnp.float32))
    Fp16 = Fp.with_storage()
    Fp8 = Fp.with_storage("int8")
    gp = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    gam = (1.0 / (3.0 * jnp.max(jnp.asarray(prob.L, jnp.float32)))).astype(
        jnp.float32
    )
    cfgp = SAGACfg(N=Np, sag=False, batch=BATCH, block=True, coeff=True,
                   fused=True)
    target = prob.f_star + 1e-3 * abs(prob.f_star)
    switch = prob.f_star + 5e-2 * abs(prob.f_star)  # above bf16's ~1.4e-2 floor

    @jax.jit
    def cost_fn(A, b, z):
        r = jnp.dot(A, z, precision=jax.lax.Precision.HIGHEST) - b
        return 0.5 * jnp.sum(r * r) + prob.lam * jnp.sum(jnp.abs(z))

    chunk = 256 * (Np // BATCH)   # 256 epochs per dispatch
    MAX_ROUNDS = 24               # ≤ 6144 epochs

    def run_to(state, F, level):
        for r in range(MAX_ROUNDS):
            if float(cost_fn(Ap, bp, state.z)) <= level:
                return state, r
            state = saga_run(F, gp, state, cfgp, chunk)
        return state, MAX_ROUNDS

    # compile all storage paths, the rebase and the cost check outside
    # the clock (saga_rebase traces per oracle structure — an unwarmed
    # call would remote-compile inside the timed region)
    st0 = saga_init(Fp, gp, jnp.zeros(npx, jnp.float32), gam, key, cfgp)
    _ = float(saga_run(Fp, gp, st0, cfgp, chunk).z[0])
    _ = float(saga_run(Fp16, gp, st0, cfgp, chunk).z[0])
    _ = float(saga_run(Fp8, gp, st0, cfgp, chunk).z[0])
    _ = float(saga_rebase(Fp, st0, cfgp).av[0])
    _ = float(cost_fn(Ap, bp, st0.z))

    for label, plan in (
        ("f32", ((Fp, target),)),
        ("bf16->f32 two-stage", ((Fp16, switch), (Fp, target))),
        # int8 tracks bf16's trajectory to the switch level (measured,
        # PERF.md) at 1.25x the step rate
        ("int8->f32 two-stage", ((Fp8, switch), (Fp, target))),
    ):
        stp = saga_init(Fp, gp, jnp.zeros(npx, jnp.float32), gam, key, cfgp)
        t0 = time.perf_counter()
        rounds = 0
        for si, (F_stage, level) in enumerate(plan):
            # storage SWITCH (stage 2+ only — the init state is already
            # consistent): re-derive av from the table under the new
            # rows — the delta-maintained av otherwise keeps the old
            # operator's bias forever (floors at ~the quantization
            # error; saga_rebase docstring has the measurement)
            if si:
                stp = saga_rebase(F_stage, stp, cfgp)
            stp, r = run_to(stp, F_stage, level)
            rounds += r
        dt = time.perf_counter() - t0
        reached = float(cost_fn(Ap, bp, stp.z)) <= target
        if reached:
            log(f"time-to-rel-1e-3, {Np}x{npx} planted Lasso [{label}]: "
                f"{dt:.2f}s (≤{rounds * 256} epochs; CPU batch-1 loop at "
                f"~42k samples/s would need ~{rounds * 256 * Np / 42_000:,.0f}s "
                f"for the same epochs)")
        else:
            log(f"time-to-rel-1e-3 [{label}]: NOT reached within "
                f"{MAX_ROUNDS * 256} epochs ({dt:.2f}s) — do not quote")

    # Katyusha (beyond the reference): same time-to-target benchmark as
    # the staged SAGA rows above — acceleration pays in EPOCHS, so wall
    # time competes with narrow-storage SAGA despite identical per-step
    # bandwidth (one block row-read per inner step).
    from ciao_tpu.solvers.katyusha import (
        KatyushaCfg, katyusha_init, katyusha_run,
    )

    mk = 2 * Np // BATCH
    kcfg = KatyushaCfg(N=Np, batch=BATCH, m=mk, block=True, ns=True)
    kkey = jax.random.PRNGKey(0)
    Lm = jnp.max(jnp.asarray(prob.L, jnp.float32))
    stk0 = katyusha_init(
        Fp, gp, jnp.zeros(npx, jnp.float32), Lm,
        jnp.asarray(0.5, jnp.float32), jnp.asarray(0.5, jnp.float32),
        kkey, kcfg,
    )
    _ = float(katyusha_run(Fp, gp, stk0, kcfg, 8).x_tilde[0])  # warm
    t0 = time.perf_counter()
    stk = stk0
    k_outers = 0
    reached_k = False
    for _r in range(64):
        if float(cost_fn(Ap, bp, stk.x_tilde)) <= target:
            reached_k = True
            break
        stk = katyusha_run(Fp, gp, stk, kcfg, 8)
        k_outers += 8
    dt = time.perf_counter() - t0
    # the loop checks at chunk TOPS — recheck so a final-chunk finish
    # is not logged as a miss (same pattern as the staged-SAGA rows)
    reached_k = reached_k or float(cost_fn(Ap, bp, stk.x_tilde)) <= target
    if reached_k:
        log(f"time-to-rel-1e-3, {Np}x{npx} planted Lasso [katyusha f32]: "
            f"{dt:.2f}s ({k_outers} outer steps ≈ {3 * k_outers} epochs)")
    else:
        log(f"time-to-rel-1e-3 [katyusha f32]: NOT reached in "
            f"{k_outers} outer steps ({dt:.2f}s)")

    # DP local-update rounds at D=1 on the real chip: the multi-chip
    # throughput mode's per-chip cost (K fused local steps = one kernel
    # launch per round + the round-boundary collective, here a no-op
    # self-psum). Should match the single-chip fused SAGA numbers —
    # this pins the "per-chip throughput matches single-chip" claim the
    # virtual-mesh CI can't time.
    from ciao_tpu.parallel import make_mesh, shard_finite_sum
    from ciao_tpu.parallel.dp import DPCfg, build_dp_functions
    from ciao_tpu.sampling import Sweep

    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])
    gam_s = (1.0 / (3.0 * jnp.max(L))).astype(jnp.float32)
    K = 128
    for tag, F in (("f32", F32), ("int8", F32.with_storage("int8"))):
        Fd = shard_finite_sum(F, mesh1)
        cfg = DPCfg(N=N, D=1, b_loc=BATCH, sweeping=Sweep.RANDOM,
                    alpha=0.999, block=True, coeff=True, local_steps=K,
                    fused=True, rebase_every=50)
        init_c, _, run_c, _ = build_dp_functions("saga", mesh1, Fd, g, cfg)
        st = init_c(Fd, g, x0, gam_s, key)
        rounds = 512  # 65k steps — ≥0.4 s of device work on every path
        st2 = run_c(Fd, g, st, rounds)
        _ = float(st2.z[0])
        t0 = time.perf_counter()
        st2 = run_c(Fd, g, st, rounds)
        _ = float(st2.z[0])
        dt = time.perf_counter() - t0
        steps = rounds * K
        log(f"dp-saga local rounds, D=1 [{tag}]: "
            f"{dt / steps * 1e3:.4f} ms/step "
            f"({steps * BATCH / dt / 1e6:.1f} M samples/s; K={K} steps "
            f"per collective)")


def main():
    # the TPU tunnel occasionally drops the first connection — retry once
    try:
        tpu = tpu_samples_per_s()
    except Exception as e:  # noqa: BLE001
        log(f"TPU run failed ({type(e).__name__}: {e}); retrying once")
        tpu = tpu_samples_per_s()
    import os

    if os.environ.get("CIAO_BENCH_ALL"):
        tpu_samples_per_s(storage="f32")  # exact-f32 path (stderr)
        bench_secondary()
    cpu = cpu_baseline_samples_per_s()
    log(f"CPU batch-1 baseline: {cpu:,.0f} samples/s")
    print(
        json.dumps(
            {
                "metric": "saga_samples_per_s",
                "value": round(tpu, 1),
                "unit": "samples/s",
                "vs_baseline": round(tpu / cpu, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
