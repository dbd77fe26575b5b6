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

Prints the driver-consumed JSON line FIRST:
  {"metric": "saga_samples_per_s", "value": ..., "unit": "samples/s",
   "vs_baseline": <tpu samples/s ÷ cpu-loop samples/s>}
then the BASELINE.md anchors as secondary JSON lines (the 10M×100
LFinito epochs/s and the staged int8→f32 time-to-rel-1e-3), machine-
captured every round. Details go to stderr; `CIAO_BENCH_ALL=1` adds
the full per-family fused-kernel table (PERF.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Tunnel-outage hardening (VERDICT r4 #1). The axon TPU backend dials an
# HTTP tunnel lazily on first jax use; when the tunnel is down the dial
# HANGS (round 4 lost its entire perf capture to a ~50-minute silent
# stall under the driver's timeout). Three defenses, all subprocess/
# thread based so a dead backend can never wedge THIS process:
#   1. probe_backend(): run `import jax + one tiny device computation`
#      in a SUBPROCESS with a hard per-attempt timeout; retry with
#      short backoff inside an explicit total deadline, then give up
#      FAST with a nonzero exit.
#   2. a watchdog thread with a whole-run deadline: if the measurement
#      program itself wedges mid-run (tunnel drops after the probe),
#      os._exit — rc 0 if the driver-consumed headline line already
#      flushed (partial success), rc 3 otherwise.
#   3. headline_printed flag so the watchdog can tell those apart.
# ---------------------------------------------------------------------------
PROBE_TIMEOUT_S = float(os.environ.get("CIAO_BENCH_PROBE_TIMEOUT", "150"))
PROBE_DEADLINE_S = float(os.environ.get("CIAO_BENCH_PROBE_DEADLINE", "600"))
BENCH_DEADLINE_S = float(os.environ.get("CIAO_BENCH_DEADLINE", "2700"))

_PROBE_SRC = """
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()[0]
x = jnp.ones((256, 256), jnp.float32)
v = float(jnp.sum(jnp.dot(x, x)))
assert v == 256.0 ** 3, v
print(f"PROBE_OK {d.platform} {d.device_kind} {time.time() - t0:.1f}s",
      flush=True)
"""

_headline_printed = False


def probe_backend() -> bool:
    """True iff a subprocess can import jax and run one tiny device
    computation within PROBE_TIMEOUT_S, retrying with backoff until
    PROBE_DEADLINE_S. Never hangs the caller: the child is hard-killed
    on timeout (the axon dial has no internal timeout of its own)."""
    t_end = time.monotonic() + PROBE_DEADLINE_S
    attempt = 0
    while True:
        attempt += 1
        budget = min(PROBE_TIMEOUT_S, max(10.0, t_end - time.monotonic()))
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=budget,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                log(f"backend probe ok (attempt {attempt}): "
                    f"{r.stdout.strip().splitlines()[-1]}")
                return True
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            log(f"backend probe attempt {attempt} failed rc={r.returncode}: "
                + " | ".join(tail))
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt} timed out after "
                f"{time.monotonic() - t0:.0f}s (tunnel hang — child killed)")
        if time.monotonic() + 20.0 >= t_end:
            log(f"backend unreachable after {attempt} attempts / "
                f"{PROBE_DEADLINE_S:.0f}s deadline — giving up fast")
            return False
        time.sleep(20.0)


def _start_watchdog() -> None:
    """Hard whole-run deadline: past BENCH_DEADLINE_S the process exits
    NOW (os._exit — a wedged tunnel ignores soft signals), rc 0 if the
    headline JSON already flushed, rc 3 if the round has no number."""
    def fire():
        time.sleep(BENCH_DEADLINE_S)
        if _headline_printed:
            log(f"watchdog: deadline {BENCH_DEADLINE_S:.0f}s hit AFTER the "
                "headline flushed — exiting 0 with partial secondaries")
            os._exit(0)
        log(f"watchdog: deadline {BENCH_DEADLINE_S:.0f}s hit with NO "
            "headline — exiting 3")
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()


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



def staged_time_to_target(plans=("f32", "bf16->f32 two-stage",
                                 "int8->f32 two-stage")):
    """Time-to-rel-1e-3 on the planted 65,536x1,024 well-conditioned
    Lasso (the corrected convergence benchmark — see PERF.md for why
    rel 1e-6 and the raw generator are unusable). Returns
    {label: (seconds, reached, epochs)}; all compiles warmed outside
    the clock."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_rebase, saga_run
    from ciao_tpu.utils.problems import make_lasso

    key = jax.random.PRNGKey(0)
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
    MAX_ROUNDS = 24               # <= 6144 epochs

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
    plan_map = {
        "f32": ((Fp, target),),
        "bf16->f32 two-stage": ((Fp16, switch), (Fp, target)),
        # int8 tracks bf16's trajectory to the switch level (measured,
        # PERF.md) at 1.25x the step rate
        "int8->f32 two-stage": ((Fp8, switch), (Fp, target)),
    }
    warm = [Fp]
    for label in plans:
        for F_stage, _ in plan_map[label]:
            if all(F_stage is not w for w in warm):  # oracles unhashable
                warm.append(F_stage)
    for F_stage in warm:
        _ = float(saga_run(F_stage, gp, st0, cfgp, chunk).z[0])
    _ = float(saga_rebase(Fp, st0, cfgp).av[0])
    _ = float(cost_fn(Ap, bp, st0.z))

    results = {}
    for label in plans:
        plan = plan_map[label]
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
        results[label] = (dt, reached, rounds * 256)
        if reached:
            log(f"time-to-rel-1e-3, {Np}x{npx} planted Lasso [{label}]: "
                f"{dt:.2f}s (<={rounds * 256} epochs; CPU batch-1 loop at "
                f"~42k samples/s would need ~{rounds * 256 * Np / 42_000:,.0f}s "
                f"for the same epochs)")
        else:
            log(f"time-to-rel-1e-3 [{label}]: NOT reached within "
                f"{MAX_ROUNDS * 256} epochs ({dt:.2f}s) — do not quote")
    return results


def lfinito_10m_epochs_per_s(storage: str = "int8") -> float:
    """The BASELINE.json headline: LFinito epochs/s on the 10M x 100
    Lasso (rows zero-padded to the 128-lane boundary; see
    examples/lasso_10m.py for the design note). One fused epoch = two
    streaming passes over A."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.finito import FinitoCfg, finito_run, lfinito_init

    Nb, nb, Bb = 10 * 1024 * 1024, 128, 8_192
    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    out_dt = jnp.bfloat16 if storage == "bf16" else jnp.float32

    @jax.jit
    def gen(kA):
        a = jax.random.normal(kA, (Nb, nb), jnp.float32)
        a = a * (jnp.arange(nb) < 100).astype(jnp.float32)[None, :]
        if storage == "int8":
            from ciao_tpu.oracles.base import quantize_rows

            q, rs = quantize_rows(a)
            return q, rs, jnp.sum(a * a, axis=1) * Nb
        return a.astype(out_dt), None, jnp.sum(a * a, axis=1) * Nb

    A, rs, L = gen(kA)
    b = jax.random.normal(kb, (Nb,), jnp.float32)
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(Nb), jnp.float32),
                         row_scale=rs)
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    cfg = FinitoCfg(N=Nb, batch=Bb, sweeping=3, alpha=0.999, fused=True)
    st = lfinito_init(F, g, jnp.zeros(nb, jnp.float32), 0.999 * Nb / L,
                      key, cfg)
    # >=0.5 s of device work in the timed scan; warm the TIMED length
    est_epoch_s = 2 * Nb * nb * A.dtype.itemsize / 4.5e11
    epochs = min(512, int(0.5 / est_epoch_s) + 1)
    st2 = finito_run(F, g, st, cfg, "lfinito", epochs)
    _ = float(st2.z[0])
    t0 = time.perf_counter()
    st2 = finito_run(F, g, st, cfg, "lfinito", epochs)
    _ = float(st2.z[0])
    dt = time.perf_counter() - t0
    log(f"lfinito 10.5Mx100 [{storage}]: {dt / epochs * 1e3:.2f} ms/epoch "
        f"({epochs / dt:.1f} epochs/s, {epochs * 2 * Nb / dt / 1e9:.2f} G "
        f"grad-evals/s)")
    return epochs / dt


def deep_target_10m(Nb=10 * 1024 * 1024, n_true=100, nb=128, Bb=8_192,
                    E=64, MAX_CHUNKS=40):
    """BASELINE.md rows 1-2 on the BASELINE config itself: deep-target
    suboptimality on the 10M×100 sparse Lasso (VERDICT r2 #2).

    The planted well-conditioned generator gives an EXACT f* at this
    scale, so the suboptimality gap needs no reference solver; the gap
    is evaluated HOST-SIDE in f64 chunks (an on-chip f32 reduction of
    10.5M squared residuals cannot resolve rel 1e-6, and f64 is not
    viable on-chip) and OUTSIDE the solver clock — time-to-target is
    pure solver wall time. Solver: fused-LFinito f32 epochs (the 10M
    workhorse, ~19 ms/epoch), plus the staged int8→f32 schedule.

    Returns (t_f32, floor_f32, ep_f32, cross_f32, t_staged,
    floor_staged, cross_staged, t_saga, floor_saga, cross_saga) —
    LFinito-f32, LFinito-staged-int8→f32 and streamed-SAGA-f32 plans;
    each ``cross_*`` maps a rel target in {1e-3..1e-6} to the solver
    seconds when first reached (None = the floor sits above it —
    documented, not quoted)."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import LeastSquaresRows
    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.finito import FinitoCfg, finito_run, lfinito_init

    HI = jax.lax.Precision.HIGHEST
    p_supp, lam, rho = 8, 1.0, 10.0

    # Planted well-conditioned lasso (utils.problems.make_lasso's
    # capped-column recipe) built ENTIRELY ON DEVICE — a host-generated
    # 5.4 GB operator would spend many minutes per transfer through the
    # axon HTTP tunnel. Columns beyond n_true are zero (lane padding).
    @jax.jit
    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        y = jax.random.uniform(k1, (Nb,), jnp.float32)
        y = y / jnp.sqrt(jnp.vdot(y, y))
        mask = (jnp.arange(nb) < n_true).astype(jnp.float32)
        C = (jax.random.uniform(k2, (Nb, nb), jnp.float32) * 2.0
             - 1.0) * mask[None, :]
        CTy = jnp.abs(jnp.dot(C.T, y, precision=HI))        # (nb,)
        pth = jnp.sort(CTy)[-p_supp]                        # p-th largest
        alpha = jnp.where(mask > 0,
                          jnp.minimum(lam / jnp.maximum(CTy, 1e-30),
                                      lam / pth), 0.0)
        A = C * alpha[None, :]
        supp = CTy >= pth
        sgn = jnp.sign(jnp.dot(A.T, y, precision=HI))
        xs = jnp.where(
            supp,
            jax.random.uniform(k3, (nb,), jnp.float32)
            * (rho / np.sqrt(p_supp)) * sgn, 0.0,
        )
        b = jnp.dot(A, xs, precision=HI) + y
        # r* = Ax* − b COMPUTED (not −y: the f32 rounding of b is part
        # of the problem definition; the gap form below uses this r*)
        r_star = jnp.dot(A, xs, precision=HI) - b
        L = jnp.sum(A * A, axis=1) * Nb
        return A, b, r_star, xs, L

    log(f"deep target: generating planted {Nb}x{n_true} lasso (on device)")
    A_dev, b_dev, r_star, xs, L = build(jax.random.PRNGKey(0))
    jax.block_until_ready(L)

    # Suboptimality gap in the cancellation-free DIFFERENCE form:
    #   cost(z) − cost(x*) = ½‖r*+u‖² − ½‖r*‖² + λ(‖z‖₁−‖x*‖₁)
    #                      = ½‖u‖² + ⟨u, r*⟩ + λ(‖z‖₁−‖x*‖₁),
    # u = A(z−x*). b cancels EXACTLY, so the quadratic part needs no
    # f64: near the optimum ‖u‖ → 0 and the f32 reduction error
    # (~eps·log N·‖u‖‖r*‖) sits orders below the 1e-6·f* target. The
    # tiny L1 difference is exact f64 on host. cost(x*) itself carries
    # only the construction's f32 rounding (≲1e-9 relative — the
    # measured gap upper-bounds true suboptimality by that much).
    # NOTE: A/xs/r* are ARGUMENTS, never closed over — a closed-over
    # device array becomes a jaxpr constant that the axon tunnel ships
    # in the remote-compile payload (5.4 GB here; observed to hang)
    @jax.jit
    def gap_quad(A, xs, r_star, z):
        # compensated chunked reduction (solvers.polish._two_sum): the
        # plain f32 vdot over 10.5M terms rounds at ~7 % of a 1e-6·f*
        # gap — the two-sum carries put the measurement noise ~3 orders
        # below the deepest quoted crossing
        from ciao_tpu.solvers.polish import _two_sum

        C = 32_768
        while A.shape[0] % C:
            C //= 2
        d = A.shape[0] // C
        dz = z - xs

        def body(carry, i):
            qhi, qlo, phi, plo = carry
            A_B = jax.lax.dynamic_slice_in_dim(A, i * C, C, 0)
            r_B = jax.lax.dynamic_slice_in_dim(r_star, i * C, C, 0)
            u = jnp.dot(A_B, dz, precision=HI)
            qhi, qlo = _two_sum(qhi, qlo,
                                0.5 * jnp.vdot(u, u, precision=HI))
            phi, plo = _two_sum(phi, plo,
                                jnp.vdot(u, r_B, precision=HI))
            return (qhi, qlo, phi, plo), None

        z0 = jnp.zeros((), jnp.float32)
        (qhi, qlo, phi, plo), _ = jax.lax.scan(
            body, (z0, z0, z0, z0), jnp.arange(d))
        return (qhi + qlo) + (phi + plo)

    xs_np = np.asarray(xs, np.float64)
    f_star = (0.5 * float(jnp.vdot(r_star, r_star))
              + lam * float(np.abs(xs_np).sum()))
    log(f"deep target: f* = {f_star:.9f}")

    def gap_rel(z):
        l1 = lam * (np.abs(np.asarray(z, np.float64)).sum()
                    - np.abs(xs_np).sum())
        return (float(gap_quad(A_dev, xs, r_star, z)) + l1) / abs(f_star)

    g = NormL1(lam=jnp.asarray(lam, jnp.float32))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(nb, jnp.float32)
    cfg = FinitoCfg(N=Nb, batch=Bb, sweeping=3, alpha=0.999,
                    fused=jax.default_backend() == "tpu")
    targets = (1e-3, 1e-4, 1e-5, 1e-6)
    # E epochs per chunk (~1.2 s f32 at the 10M config); MAX_CHUNKS
    # bounds each stage at E*MAX_CHUNKS epochs

    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_rebase, saga_run

    spe = Nb // Bb
    Lmax = jnp.max(L)
    gam_saga = (1.0 / (3.0 * Lmax)).astype(jnp.float32)
    scfg = SAGACfg(N=Nb, sag=False, batch=Bb, block=True, coeff=True,
                   fused_stream=jax.default_backend() == "tpu")

    def run_plan(family, stages):
        """``family`` in {"lfinito", "saga"}; ``stages`` =
        ((storage, stop_rel), ...); returns
        (t_solve, gap, epochs, crossings)."""
        t_solve, epochs = 0.0, 0
        crossings = {t: None for t in targets}
        gap = float("inf")
        st = None
        for storage, stop_rel in stages:
            F = LeastSquaresRows(
                A=A_dev, b=b_dev, scale=jnp.asarray(float(Nb), jnp.float32)
            )
            if storage != "f32":
                F = F.with_storage(storage)
            if family == "lfinito":
                if st is None:
                    st = lfinito_init(F, g, x0, 0.999 * Nb / L, key, cfg)
                # LFinito's anchor refresh re-derives its state from
                # z_full every epoch — a storage switch self-heals
                E_eff = E
                chunk = lambda s: finito_run(F, g, s, cfg, "lfinito", E)
            else:
                if st is None:
                    st = saga_init(F, g, x0, gam_saga, key, scfg)
                else:
                    # delta-maintained av keeps the OLD operator's bias
                    # forever without the rebase (saga_rebase docstring)
                    st = saga_rebase(F, st, scfg)
                # SAGA converges in a handful of epochs here — finer
                # chunks (16 epochs ≈ 0.2 s of work, still safely above
                # the tunnel dispatch noise) resolve the crossings
                E_eff = max(1, E // 4)
                chunk = lambda s: saga_run(F, g, s, scfg, E_eff * spe)
            _ = float(chunk(st).z[0])       # warm the timed shape
            hist = []
            for _c in range(MAX_CHUNKS):
                t0 = time.perf_counter()
                st = chunk(st)
                _ = float(st.z[0])          # hard sync through the tunnel
                t_solve += time.perf_counter() - t0
                epochs += E_eff
                gap = gap_rel(st.z)
                for t in targets:
                    if gap <= t and crossings[t] is None:
                        crossings[t] = round(t_solve, 2)
                hist.append(gap)
                if gap <= stop_rel:
                    break
                # floor detection: <0.5% relative improvement across
                # the last two chunks (slow linear phases still clear
                # several % per chunk; a true dtype floor is ~0%)
                if (len(hist) >= 3
                        and hist[-3] - hist[-1] < 0.005 * abs(hist[-3])):
                    break
            del F
        return t_solve, gap, epochs, crossings, st.z

    t_f32, floor_f32, ep_f32, cross_f32, _ = run_plan(
        "lfinito", (("f32", 1e-6),)
    )
    log(f"deep target [f32 LFinito]: floor rel {floor_f32:.3e} after "
        f"{ep_f32} epochs / {t_f32:.1f}s solver time; crossings "
        f"{cross_f32}")
    t_stg, floor_stg, ep_stg, cross_stg, _ = run_plan(
        "lfinito", (("int8", 5e-2), ("f32", 1e-6))
    )
    log(f"deep target [staged int8->f32]: floor rel {floor_stg:.3e} after "
        f"{ep_stg} epochs / {t_stg:.1f}s; crossings {cross_stg}")
    t_sg, floor_sg, ep_sg, cross_sg, z_sg = run_plan("saga", (("f32", 1e-6),))
    log(f"deep target [f32 SAGA streamed]: floor rel {floor_sg:.3e} after "
        f"{ep_sg} epochs / {t_sg:.1f}s; crossings {cross_sg}")
    # (A streamed-Finito plan was measured and dropped: its per-row
    # γ = 0.999N/L_i trajectory crawls on this instance — rel ~3e2
    # after 500 epochs — while SAGA clears the floor in 64. The
    # kernel's win is raw throughput, 1.06 G samples/s, not epochs.)

    # ---- compensated-gradient FISTA polish (solvers.polish) --------
    # Every f32 stochastic plan floors at rel ~4e-5: the full-gradient
    # reduction's √N·eps rounding, not the iterate's resolution. The
    # polish streams the same f32 rows with two-sum chunk accumulation
    # (gradient noise ~√chunk·eps instead) and — the planted operator's
    # Hessian being near-isotropic at N ≫ n (κ ≈ 1.03) — closes
    # 4e-5 → 1e-6 in a handful of 2-pass epochs. Clock includes the
    # λmax power estimate; compiles are excluded as everywhere here.
    from ciao_tpu.solvers import fista_polish, lsq_power_lmax

    F32 = LeastSquaresRows(
        A=A_dev, b=b_dev, scale=jnp.asarray(float(Nb), jnp.float32))
    Kp, CH = 4, 32_768
    _ = float(lsq_power_lmax(F32, jax.random.PRNGKey(3), iters=4))  # warm
    t0 = time.perf_counter()
    lmax = float(lsq_power_lmax(F32, jax.random.PRNGKey(3), iters=4))
    t_pol = time.perf_counter() - t0
    eta = jnp.asarray(0.9 / lmax, jnp.float32)
    z = z_sg
    _ = float(fista_polish(F32, g, z, eta, Kp, CH).x[0])            # warm
    gap_pol, pol_steps = floor_sg, 0
    hist = [gap_pol]
    for _c in range(16):
        t0 = time.perf_counter()
        z = fista_polish(F32, g, z, eta, Kp, CH).x
        _ = float(z[0])
        t_pol += time.perf_counter() - t0
        pol_steps += Kp
        gap_pol = gap_rel(z)
        for t in targets:
            if gap_pol <= t and cross_sg[t] is None:
                cross_sg[t] = round(t_sg + t_pol, 2)
        hist.append(gap_pol)
        if gap_pol <= 1e-7 or (len(hist) >= 3 and
                               hist[-3] - hist[-1]
                               < 0.005 * abs(hist[-3])):
            break
    log(f"deep target [+polish]: rel {gap_pol:.3e} after {pol_steps} "
        f"FISTA steps / {t_pol:.2f}s on top of SAGA's floor; crossings "
        f"now {cross_sg}")

    # ---- the PUBLIC API (ciao_tpu.deep_solve) end-to-end -----------
    # The exact plan above — streamed SAGA to its plateau, automatic-η
    # compensated FISTA polish — as the ONE exported call (VERDICT r3
    # #1). Warm every jitted piece at the timed shapes with a tiny-
    # budget call first (all chunk/step shapes identical → cache hits),
    # then time the real call; the plateau checks and λ̂ power pass are
    # part of the algorithm and stay on the clock.
    from ciao_tpu.solvers import deep_solve

    Fapi = LeastSquaresRows(
        A=A_dev, b=b_dev, scale=jnp.asarray(float(Nb), jnp.float32))
    api_kw = dict(L=L, N=Nb, batch=Bb, chunk_epochs=16,
                  plateau_rtol=1e-5, max_epochs=192, polish_steps=Kp,
                  polish_max_rounds=8, polish_chunk=CH)
    _ = deep_solve(x0, Fapi, g, **{**api_kw, "max_epochs": 16,
                                   "polish_max_rounds": 1})   # warm
    t0 = time.perf_counter()
    z_api, dinfo = deep_solve(x0, Fapi, g, **api_kw)
    _ = float(z_api[0])
    t_api = time.perf_counter() - t0
    gap_api = gap_rel(z_api)
    log(f"deep target [deep_solve API]: rel {gap_api:.3e} in {t_api:.2f}s "
        f"end-to-end ({sum(dinfo.staged.epochs)} SAGA epochs + "
        f"{dinfo.polish_steps} polish steps, eta={dinfo.eta:.3e})")
    return (t_f32, floor_f32, ep_f32, cross_f32, t_stg, floor_stg,
            cross_stg, t_sg, floor_sg, ep_sg, cross_sg, t_pol, gap_pol,
            pol_steps, t_api, gap_api)


def bench_missing_cells():
    """The round-2 PERF table's unmeasured narrow-storage cells
    (VERDICT r2 #5) + the round-3 additions: ZeroFPR bf16/int8,
    Point-SAGA logistic bf16/int8, Huber-SAGA bf16/int8,
    importance-SAGA bf16/int8, adaptive-γ PANOC step cost, Davis-Yin
    and Condat-Vũ step costs, and the widened fused-ProShI gate
    (shuffled at the cyclic config; random-block at d=64). All timed
    regions hold >=0.25 s of device work, warmed at the timed shape."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.oracles import HuberRows, LeastSquaresRows, LogisticRows
    from ciao_tpu.prox import NormL1, Zero as _Zero

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A = jax.random.normal(kA, (N, n), jnp.float32)
    b = jax.random.normal(kb, (N,), jnp.float32)
    g = NormL1(lam=jnp.asarray(0.1, jnp.float32))
    L = jnp.sum(A * A, axis=1) * N
    Lm = jnp.max(L)
    x0 = jnp.zeros(n, jnp.float32)
    y_cls = jnp.sign(jax.random.normal(kb, (N,), jnp.float32))

    def timed(fn, state, steps, sync):
        st = fn(state, steps)
        _ = float(sync(st))
        t0 = time.perf_counter()
        st = fn(state, steps)
        _ = float(sync(st))
        return (time.perf_counter() - t0) / steps * 1e3, st

    from ciao_tpu.solvers.panoc import PANOCCfg, panoc_init, panoc_run
    from ciao_tpu.solvers.point_saga import (
        PointSAGACfg, point_saga_init, point_saga_run,
    )
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run

    for tag in ("f32", "bf16", "int8"):
        F = LeastSquaresRows(A=A, b=b,
                             scale=jnp.asarray(float(N), jnp.float32))
        F_log = LogisticRows(X=A, y=y_cls)
        F_hub = HuberRows(A=A, b=b, delta=jnp.asarray(0.7, jnp.float32),
                          scale=jnp.asarray(float(N), jnp.float32))
        from ciao_tpu.oracles import SquaredHingeRows

        F_sqh = SquaredHingeRows(A=A, y=y_cls,
                                 scale=jnp.asarray(1.0, jnp.float32))
        from ciao_tpu.oracles import PoissonRows

        # synthetic counts; rates are irrelevant to the byte/VPU cost
        y_cnt = jnp.abs(jnp.round(3.0 * jax.random.normal(kb, (N,))))
        F_poi = PoissonRows(A=A, y=y_cnt.astype(jnp.float32),
                            scale=jnp.asarray(1.0, jnp.float32))
        if tag != "f32":
            F, F_log, F_hub, F_sqh, F_poi = (
                o.with_storage(tag)
                for o in (F, F_log, F_hub, F_sqh, F_poi))

        # ZeroFPR (2 FBE evals/step at steady τ=1; near a narrow
        # storage's floor the thrash gauge reports the real evals/step)
        zcfg = PANOCCfg(N=N, zerofpr=True, fused=True)
        gam = (0.95 / jnp.mean(L)).astype(jnp.float32)
        sig = jnp.asarray(0.5 * 0.05 / (2.0 * gam), jnp.float32)
        st0 = panoc_init(F, g, x0, gam, sig, zcfg)
        ms, st = timed(lambda s, k: panoc_run(F, g, s, zcfg, k), st0,
                       128, lambda s: s.x[0])
        log(f"zerofpr fused [{tag}]: {ms:.2f} ms/step "
            f"(ls_ewma {float(st.ls_ewma):.2f} evals/step)")

        # Point-SAGA on logistic rows (in-kernel 20-step Newton θ-solve)
        pcfg = PointSAGACfg(N=N, batch=BATCH, block=True, fused=True)
        L_log = 0.25 * jnp.sum(A * A, axis=1) * N
        st0 = point_saga_init(F_log, _Zero(), x0,
                              (1.0 / (3 * jnp.max(L_log))).astype(
                                  jnp.float32), key, pcfg)
        S = 768 * STEPS_PER_EPOCH
        ms, _ = timed(lambda s, k: point_saga_run(F_log, _Zero(), s,
                                                  pcfg, k),
                      st0, S, lambda s: s.x[0])
        log(f"point-saga logistic fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Huber SAGA (MODE_HUBER coefficient formula, δ = aux scalar)
        scfg = SAGACfg(N=N, sag=False, batch=BATCH, block=True,
                       coeff=True, fused=True)
        st0 = saga_init(F_hub, g, x0,
                        (1.0 / (3.0 * Lm)).astype(jnp.float32), key, scfg)
        S = 1024 * STEPS_PER_EPOCH  # >=0.4 s even at int8's ~0.0065 ms
        ms, _ = timed(lambda s, k: saga_run(F_hub, g, s, scfg, k), st0, S,
                      lambda s: s.z[0])
        log(f"huber saga fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Squared hinge (smooth SVM) — MODE_SQHINGE, round 3
        st0 = saga_init(F_sqh, g, x0,
                        (1.0 / (3.0 * Lm)).astype(jnp.float32), key, scfg)
        ms, _ = timed(lambda s, k: saga_run(F_sqh, g, s, scfg, k), st0, S,
                      lambda s: s.z[0])
        log(f"sqhinge saga fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Point-SAGA on squared-hinge rows (round-4 in-kernel closed
        # form: one activity test — must sit at the LSQ θ-solve rates,
        # no Newton tax)
        st0 = point_saga_init(F_sqh, _Zero(), x0,
                              (1.0 / (3.0 * Lm)).astype(jnp.float32),
                              key, pcfg)
        ms, _ = timed(lambda s, k: point_saga_run(F_sqh, _Zero(), s,
                                                  pcfg, k),
                      st0, 768 * STEPS_PER_EPOCH, lambda s: s.x[0])
        log(f"point-saga sqhinge fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Poisson GLM — MODE_POISSON (exp on the VPU), round 3
        st0 = saga_init(F_poi, g, x0,
                        (1.0 / (3.0 * Lm)).astype(jnp.float32), key, scfg)
        ms, _ = timed(lambda s, k: saga_run(F_poi, g, s, scfg, k), st0, S,
                      lambda s: s.z[0])
        log(f"poisson saga fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Point-SAGA on Poisson rows (in-kernel 20-step Newton θ-solve)
        st0 = point_saga_init(F_poi, _Zero(), x0,
                              (1.0 / (30.0 * Lm)).astype(jnp.float32),
                              key, pcfg)
        Sp = 768 * STEPS_PER_EPOCH
        ms, _ = timed(lambda s, k: point_saga_run(F_poi, _Zero(), s,
                                                  pcfg, k),
                      st0, Sp, lambda s: s.x[0])
        log(f"point-saga poisson fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Importance-sampled SAGA (inverse-CDF draws + 1/(d·q_j)
        # weights in the prefetch stream) — q from the TRUE row moduli
        icfg = SAGACfg(N=N, sag=False, batch=BATCH, block=True,
                       coeff=True, fused=True, importance=True)
        d = N // BATCH
        Lb64 = np.asarray(jax.device_get(L), np.float64)
        Lblk64 = np.max(Lb64.reshape(d, BATCH), axis=1)
        q64 = Lblk64 / np.sum(Lblk64)
        qcum64 = np.cumsum(q64)
        qcum64 /= qcum64[-1]
        gam_i = jnp.asarray(1.0 / (3.0 * np.mean(Lblk64)), jnp.float32)
        st0 = saga_init(F, g, x0, gam_i, key, icfg)
        st0 = st0._replace(qcum=jnp.asarray(qcum64, jnp.float32),
                           qinv=jnp.asarray(1.0 / (d * q64), jnp.float32))
        ms, _ = timed(lambda s, k: saga_run(F, g, s, icfg, k), st0, S,
                      lambda s: s.z[0])
        log(f"importance saga fused [{tag}]: {ms:.4f} ms/step "
            f"({BATCH / ms * 1e3 / 1e6:.0f} M samples/s)")

    # adaptive-γ PANOC: each γ-trial costs ONE value-only oracle pass
    # (value_sum_all margin read) on top of the fixed-γ step
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(N), jnp.float32))
    for adaptive in (False, True):
        acfg = PANOCCfg(N=N, fused=True, adaptive=adaptive)
        gam = (0.95 / jnp.mean(L)).astype(jnp.float32)
        sig = jnp.asarray(0.5 * 0.05 / (2.0 * gam), jnp.float32)
        st0 = panoc_init(F, g, x0, gam, sig, acfg)
        ms, _ = timed(lambda s, k: panoc_run(F, g, s, acfg, k), st0, 128,
                      lambda s: s.x[0])
        log(f"panoc fused [f32, adaptive={adaptive}]: {ms:.2f} ms/step")

    # Davis-Yin / Condat-Vũ: one full-gradient pass + O(n) proxes per
    # step — must sit at the FISTA full-pass row
    from ciao_tpu.ops.linmap import FirstDifference
    from ciao_tpu.prox import IndBox
    from ciao_tpu.solvers.dys import DYSCfg, dys_init, dys_run
    from ciao_tpu.solvers.primal_dual import PDCfg, pd_init, pd_run

    for tag in ("f32", "bf16", "int8"):
        F = LeastSquaresRows(A=A, b=b,
                             scale=jnp.asarray(float(N), jnp.float32))
        if tag != "f32":
            F = F.with_storage(tag)
        h = IndBox(lo=-1.0, hi=1.0)
        dcfg = DYSCfg(N=N, fused=True)
        gam = (1.0 / jnp.mean(L)).astype(jnp.float32)
        st0 = dys_init(F, g, h, x0, gam, jnp.ones((), jnp.float32), dcfg)
        S = 600  # >=0.28 s even at int8's ~0.48 ms/step
        ms, _ = timed(lambda s, k: dys_run(F, g, h, s, dcfg, k), st0, S,
                      lambda s: s.xg[0])
        log(f"davis-yin fused [{tag}]: {ms:.3f} ms/step")

        K = FirstDifference()
        h1 = NormL1(lam=jnp.asarray(0.05, jnp.float32))
        pdc = PDCfg(N=N, fused=True)
        Lf = float(jnp.mean(L))
        sigma = jnp.asarray(0.5, jnp.float32)
        tau = jnp.asarray(0.99 / (Lf / 2.0 + 0.5 * 4.0), jnp.float32)
        st0 = pd_init(F, g, h1, K, x0, tau, sigma, pdc)
        ms, _ = timed(lambda s, k: pd_run(F, g, h1, K, s, pdc, k), st0,
                      S, lambda s: s.x[0])
        log(f"condat-vu fused [{tag}]: {ms:.3f} ms/step")

        if tag == "f32":
            # ANALYSIS SPARSITY at scale (VERDICT r3 #5): dense m×n K —
            # h(Kx) with a full analysis dictionary. Cost model: the
            # K matvec + rmatvec stream 2·m·n·4 B per step against the
            # gradient pass's N·n·4 B — at m = n = 1024 that is 0.8%
            # (expect ≈ the stencil row); m = 8192 adds ~6%.
            from ciao_tpu.ops.linmap import DenseMap

            for mK in (1024, 8192):
                kM = jax.random.normal(jax.random.PRNGKey(7),
                                       (mK, n), jnp.float32) / np.sqrt(n)
                KD = DenseMap(M=kM)
                nK2 = float(jnp.linalg.norm(kM, ord=2)) ** 2
                tauD = jnp.asarray(0.99 / (Lf / 2.0 + 0.5 * nK2),
                                   jnp.float32)
                st0 = pd_init(F, g, h1, KD, x0, tauD, sigma, pdc)
                ms, _ = timed(lambda s, k: pd_run(F, g, h1, KD, s, pdc,
                                                  k),
                              st0, S, lambda s: s.x[0])
                log(f"condat-vu fused [f32, DenseMap {mK}x{n}]: "
                    f"{ms:.3f} ms/step")

    # streamed-table SAGA (round 3): fused at ANY N — the 10M BASELINE
    # shape, where the resident-slab kernel cannot serve
    N10, n10, B10 = 10 * 1024 * 1024, 128, 8_192
    A10 = jax.random.normal(kA, (N10, n10), jnp.float32)
    b10 = jax.random.normal(kb, (N10,), jnp.float32)
    L10 = jax.jit(lambda a: jnp.max(jnp.sum(a * a, axis=1)))(A10) * N10
    def _quant_chunked(A, parts=8):
        """Row-chunked int8 quantization: a monolithic quantize_rows of
        the 5.4 GB A wants ~2 A-sized f32 temporaries and OOMs HBM once
        the round-4 bench keeps a few extra states alive — chunking
        caps the temp at A/parts (per-row scales are chunk-local)."""
        from ciao_tpu.oracles.base import quantize_rows

        qf = jax.jit(quantize_rows)
        CH = A.shape[0] // parts
        qs, rss = [], []
        for i in range(parts):
            q, rs = qf(A[i * CH:(i + 1) * CH])
            qs.append(q)
            rss.append(rs)
        return jnp.concatenate(qs), jnp.concatenate(rss)

    for tag in ("f32", "int8"):
        if tag == "f32":
            F10 = LeastSquaresRows(
                A=A10, b=b10, scale=jnp.asarray(float(N10), jnp.float32))
        else:
            q10, rs10 = _quant_chunked(A10)
            F10 = LeastSquaresRows(
                A=q10, b=b10, scale=jnp.asarray(float(N10), jnp.float32),
                row_scale=rs10)
        cfg10 = SAGACfg(N=N10, sag=False, batch=B10, block=True, coeff=True,
                    fused_stream=True)
        st0 = saga_init(F10, g, jnp.zeros(n10, jnp.float32),
                  (1.0 / (3.0 * L10)).astype(jnp.float32), key, cfg10)
        # >=0.35 s of device work (0.0095 ms/step f32 / 0.0031 int8)
        S10 = 40_000 if tag == "f32" else 120_000
        ms, _ = timed(lambda s, k: saga_run(F10, g, s, cfg10, k), st0, S10,
                      lambda s: s.z[0])
        log(f"saga streamed fused 10.5Mx128 [{tag}]: {ms:.4f} ms/step "
            f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

        # Point-SAGA and SSNM ride the same streamed machinery
        from ciao_tpu.solvers.point_saga import (
            PointSAGACfg, point_saga_init, point_saga_run,
        )
        from ciao_tpu.solvers.ssnm import SSNMCfg, ssnm_init, ssnm_run

        pcfg10 = PointSAGACfg(N=N10, batch=B10, block=True,
                              fused_stream=True)
        st0 = point_saga_init(F10, _Zero(), jnp.zeros(n10, jnp.float32),
                              (1.0 / (3.0 * L10)).astype(jnp.float32),
                              key, pcfg10)
        ms, _ = timed(lambda s, k: point_saga_run(F10, _Zero(), s, pcfg10,
                                                  k),
                      st0, S10, lambda s: s.x[0])
        log(f"point-saga streamed 10.5Mx128 [{tag}]: {ms:.4f} ms/step "
            f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

        from ciao_tpu.solvers.finito import (
            FinitoCfg as _FC, finito_coeff_init as _fci,
            finito_run as _frn,
        )

        fcfg10 = _FC(N=N10, batch=B10, sweeping=3, alpha=0.999,
                     fused_stream=True)
        L10_rows = jax.jit(lambda a: jnp.sum(a * a, axis=1))(A10) * N10
        st0 = _fci(F10, g, jnp.zeros(n10, jnp.float32),
                   0.999 * N10 / L10_rows, key, fcfg10)
        ms, _ = timed(lambda s, k: _frn(F10, g, s, fcfg10, "basic_coeff",
                                        k),
                      st0, S10, lambda s: s.z[0])
        log(f"finito streamed 10.5Mx128 [{tag}]: {ms:.4f} ms/step "
            f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

        smcfg10 = SSNMCfg(N=N10, batch=B10, fused_stream=True)
        st0 = ssnm_init(F10, g, jnp.zeros(n10, jnp.float32),
                        jnp.asarray(0.5, jnp.float32),
                        (1.0 / (1.5 * L10)).astype(jnp.float32), key,
                        smcfg10)
        ms, _ = timed(lambda s, k: ssnm_run(F10, g, s, smcfg10, k), st0,
                      S10, lambda s: s.x[0])
        log(f"ssnm streamed 10.5Mx128 [{tag}]: {ms:.4f} ms/step "
            f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

        if tag == "f32":
            # round 4 (VERDICT r3 #2): importance sampling ON the
            # streamed kernel at the BASELINE scale — systematic-πps
            # clipped schedule (the facade builds it; zero clamping by
            # construction, so the rate matches uniform streamed even
            # under heavy L skew — measured 1.03 G samples/s on a
            # power-law-scaled instance)
            import ciao_tpu as _ct

            sol_i = _ct.SAGA(maxit=1, block_sampling=True, batch=B10,
                             importance_sampling=True)
            _, _, _, icfg10, init_i = sol_i._setup(
                jnp.zeros(n10, jnp.float32), F10, g, L10_rows, N10)
            assert icfg10.fused_stream and icfg10.istrat
            st0 = init_i()
            ms, _ = timed(lambda s, k: saga_run(F10, g, s, icfg10, k),
                          st0, S10, lambda s: s.z[0])
            log(f"importance saga streamed 10.5Mx128 "
                f"[systematic-clipped {tag}]: {ms:.4f} ms/step "
                f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

            # round 5 (VERDICT r4 #6): the same schedule through the
            # OTHER two streamed kernels — Finito-coeff and Point-SAGA
            # (fixed-point table methods: no direction reweighting;
            # window-aligned launches, zero clamping by construction)
            sol_fi = _ct.Finito(maxit=1, sweeping=1,
                                minibatch=(True, B10),
                                importance_sampling=True)
            _, _, _, ficfg, init_fi, fvar = sol_fi._setup(
                jnp.zeros(n10, jnp.float32), F10, g, L10_rows, N10)
            assert (fvar == "basic_coeff" and ficfg.fused_stream
                    and ficfg.importance)
            from ciao_tpu.solvers.finito import finito_run as _frn2

            st0 = init_fi()
            ms, _ = timed(lambda s, k: _frn2(F10, g, s, ficfg,
                                             "basic_coeff", k),
                          st0, S10, lambda s: s.z[0])
            log(f"importance finito-coeff streamed 10.5Mx128 "
                f"[systematic-clipped {tag}]: {ms:.4f} ms/step "
                f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")

            sol_pi = _ct.PointSAGA(maxit=1, batch=B10,
                                   block_sampling=True,
                                   importance_sampling=True)
            _, _, _, picfg, init_pi = sol_pi._setup(
                jnp.zeros(n10, jnp.float32), F10, None, L10_rows, N10)
            assert picfg.fused_stream and picfg.importance
            st0 = init_pi()
            ms, _ = timed(lambda s, k: point_saga_run(F10, _Zero(), s,
                                                      picfg, k),
                          st0, S10, lambda s: s.x[0])
            log(f"importance point-saga streamed 10.5Mx128 "
                f"[systematic-clipped {tag}]: {ms:.4f} ms/step "
                f"({B10 / ms * 1e3 / 1e6:.0f} M samples/s)")
        del F10
    del A10, b10

    # round 5 (VERDICT r4 #3): ADAPTIVE Finito on-chip cost — the one
    # reference-proper variant without a PERF row. Measured trial
    # distribution (CPU study, PERF.md): backtracks are RARE after the
    # first epoch (~1.01-1.02 value trials/step), so the serial
    # while_loop IS optimal — a batched 3-candidate probe would pay 3x
    # the trial work every step to save a loop trip on ~1.5% of steps.
    # The per-step cost is the fixed work (2 table-row updates, prox,
    # av rescale), inherently B=1 scalar-bound per the reference's
    # algorithm (Finito_adaptive.jl:100-155).
    from ciao_tpu.solvers.finito import (
        FinitoCfg as _FCa, finito_adaptive_init, finito_run as _frna,
    )

    Na = 65_536   # adaptive holds (N,n) s + gradf + A: 3 GB at 262k
    Aa, ba = A[:Na], b[:Na]
    Fa = LeastSquaresRows(A=Aa, b=ba,
                          scale=jnp.asarray(float(Na), jnp.float32))
    acfg = _FCa(N=Na, batch=1, sweeping=2, alpha=0.999)
    st0 = finito_adaptive_init(Fa, g, x0, key, acfg)
    S_a = 8_192
    ms, _ = timed(lambda s, k: _frna(Fa, g, s, acfg, "adaptive", k),
                  st0, S_a, lambda s: s.z[0])
    log(f"adaptive finito 65kx1024 [f32, B=1]: {ms:.4f} ms/step "
        f"(serial backtracking; ~1.02 value trials/step after warmup)")

    # widened fused-ProShI gate (round 3): shuffled at the cyclic
    # config (65k×1024, d=16) and random-block at d=64 (262k×1024)
    from ciao_tpu.solvers.proshi import ProshiCfg, proshi_init, proshi_run

    gsh = IndBox(lo=-jnp.inf, hi=1.0)
    for label, Np2, sweeping, blk in (
        ("shuffled 65k", 65_536, 3, False),
        ("random-block 262k (d=64)", N, 1, True),
    ):
        A2, b2v = A[:Np2], b[:Np2]
        Fp2 = LeastSquaresRows(
            A=A2, b=b2v, scale=jnp.asarray(float(Np2), jnp.float32)
        )
        L2 = jnp.sum(A2 * A2, axis=1) * Np2
        gam2 = (0.999 * Np2 / L2).astype(jnp.float32)
        S = 8192
        for fused in (False, True):
            pcfg2 = ProshiCfg(N=Np2, batch=BATCH, sweeping=sweeping,
                              alpha=0.999, fused=fused,
                              block_sampling=blk)
            st0 = proshi_init(Fp2, gsh, x0, gam2, key, pcfg2)
            ms, _ = timed(lambda s, k: proshi_run(Fp2, gsh, s, pcfg2, k),
                          st0, S, lambda s: s.z[0])
            log(f"proshi [{label}, fused={fused}]: {ms:.4f} ms/step")


def bench_sharing_deep(Nb=65_536, nb=128, p=16):
    """Round 5 (VERDICT r4 #2's on-chip leg): the SHARING deep-accuracy
    route end-to-end on the real chip — ``deep_solve_sharing`` (f32
    ProShI + compensated periodic coupling-sum resync) on a planted
    instance with a closed-form f64 optimum. Reports wall time and the
    final host-f64 relative gap. The (N, n) DiagQuadratic stepwise path
    has no fused kernel (not rank-1) — this row also pins the stepwise
    ProShI class's on-chip per-step cost at scale."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu import deep_solve_sharing
    from ciao_tpu.oracles import DiagQuadratic
    from ciao_tpu.prox import NormL1
    from ciao_tpu.utils import make_sharing_planted

    prob = make_sharing_planted(N=Nb, n=nb, p=p, seed=0)
    F = DiagQuadratic(d=jnp.asarray(prob.d, jnp.float32),
                      q=jnp.asarray(prob.q, jnp.float32))
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    t0 = time.perf_counter()
    blocks, info = deep_solve_sharing(
        jnp.zeros(nb, jnp.float32), F, g=g, L=prob.L, N=Nb,
        batch=512, sweeping=2, chunk_epochs=16, max_epochs=512,
        resync_chunk=4096)
    dt = time.perf_counter() - t0
    rel = (prob.cost(np.asarray(blocks)) - prob.f_star) / abs(prob.f_star)
    steps = info.epochs * (Nb // 512)
    log(f"sharing deep {Nb}x{nb} [f32 ProShI+resync]: rel {rel:.2e} in "
        f"{dt:.1f}s ({info.epochs} epochs, {info.resyncs} resyncs, "
        f"~{dt / max(steps, 1) * 1e3:.3f} ms/step stepwise)")


def bench_pd_deep(Nb=262_144, nb=1_024, jumps=16):
    """Round 5: the PRIMAL-DUAL deep-accuracy route end-to-end on the
    real chip — ``deep_solve_pd`` (compensated Condat-Vũ + the
    certified TV reduced solve) on a planted fused lasso ASSEMBLED ON
    DEVICE: only the n-sized KKT ingredients (x*, Dᵀv) cross the
    tunnel; the f32 operator A = C + y·cᵀ with c = Dᵀv − Cᵀy computed
    in f32 is its own plant (KKT holds to f32 rounding → suboptimality
    of x* is second-order), r* = −y exactly by construction, and the
    gap uses the cancellation-free difference form
    ½‖u‖² + ⟨u, r*⟩ with u = A(z−x*) via double-single margins —
    the deep_target_10m metrology applied to the h(Kx) class."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ciao_tpu import FirstDifference, LeastSquaresRows, deep_solve_pd
    from ciao_tpu.prox import NormL1
    from ciao_tpu.utils import make_fused_lasso_planted

    HI = jax.lax.Precision.HIGHEST
    # host: the n-sized plant (reuse the generator's x*/v machinery at
    # a token N — only x_star / v_star / lam matter here)
    pp = make_fused_lasso_planted(N=8, n=nb, jumps=jumps, seed=0)
    Dt_v = np.zeros(nb)
    Dt_v[:-1] -= pp.v_star
    Dt_v[1:] += pp.v_star
    xs64 = pp.x_star

    @partial(jax.jit, static_argnames=("N", "n"))
    def build(key, xs, dtv, N, n):
        kc, ky = jax.random.split(key)
        C = jax.random.uniform(kc, (N, n), jnp.float32, -1.0, 1.0)
        y = jax.random.normal(ky, (N,), jnp.float32)
        y = y / jnp.linalg.norm(y)
        c = dtv - jnp.dot(y, C, precision=HI)
        A = C + y[:, None] * c[None, :]
        b = jnp.dot(A, xs, precision=HI) + y
        return A, b, y

    A, b, y = build(jax.random.PRNGKey(0),
                    jnp.asarray(xs64, jnp.float32),
                    jnp.asarray(Dt_v, jnp.float32), Nb, nb)
    A.block_until_ready()
    F = LeastSquaresRows(A=A, b=b, scale=jnp.asarray(float(Nb), jnp.float32))
    h = NormL1(lam=jnp.asarray(pp.lam, jnp.float32))

    t0 = time.perf_counter()
    x, info = deep_solve_pd(
        jnp.zeros(nb, jnp.float32), F, h=h, K=FirstDifference(), N=Nb,
        chunk=4096, chunk_steps=256, max_steps=8192)
    rel_probe = float(x[0])  # noqa: F841 — hard sync through the tunnel
    dt = time.perf_counter() - t0

    # difference-form gap vs the COMPUTED r* = −y of the f32 operator
    @partial(jax.jit, static_argnames=("chunk",))
    def quad_gap(A, y, d_hi, d_lo, chunk: int):
        def body(carry, i):
            hi, lo = carry
            A_B = jax.lax.dynamic_slice_in_dim(A, i * chunk, chunk, 0)
            y_B = jax.lax.dynamic_slice_in_dim(y, i * chunk, chunk)
            u = (jnp.dot(A_B, d_hi, precision=HI)
                 + jnp.dot(A_B, d_lo, precision=HI))
            p = jnp.sum(0.5 * u * u - u * y_B)
            s = hi + p
            t = s - hi
            e = (p - t) + (hi - (s - t))
            return (s, lo + e), None

        (hi, lo), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32),) * 2,
            jnp.arange(A.shape[0] // chunk))
        return hi + lo

    d64 = np.asarray(x, np.float64) - xs64
    d_hi = np.asarray(d64, np.float32)
    d_lo = np.asarray(d64 - d_hi.astype(np.float64), np.float32)
    gap_q = float(quad_gap(A, y, jnp.asarray(d_hi), jnp.asarray(d_lo), 4096))
    tv = pp.lam * (np.sum(np.abs(np.diff(np.asarray(x, np.float64))))
                   - np.sum(np.abs(np.diff(xs64))))
    f_star = 0.5 + pp.lam * np.sum(np.abs(np.diff(xs64)))
    rel = (gap_q + tv) / f_star
    log(f"pd deep {Nb}x{nb} [f32 CondatVu+certified-TV-refine]: rel "
        f"{rel:.2e} in {dt:.1f}s ({info.steps} CV steps, refined="
        f"{info.refined} certified={info.certified}, "
        f"~{dt / max(info.steps, 1) * 1e3:.2f} ms/step incl. compile)")

    # THREE-TERM leg (round 5 late): λ₁‖x‖₁ + λ₂‖Dx‖₁ via tv_refine3's
    # interval-propagation certificate — same device-assembled plant
    # with the two-multiplier correction Aᵀy* = u + Dᵀv
    from ciao_tpu.utils import make_three_term_planted

    p3 = make_three_term_planted(N=8, n=nb, jumps=jumps, seed=0)
    Dt_v3 = np.zeros(nb)
    Dt_v3[:-1] -= p3.v_star
    Dt_v3[1:] += p3.v_star
    corr3 = jnp.asarray(p3.u_star + Dt_v3, jnp.float32)
    A3, b3, y3 = build(jax.random.PRNGKey(1),
                       jnp.asarray(p3.x_star, jnp.float32), corr3, Nb, nb)
    A3.block_until_ready()
    F3 = LeastSquaresRows(A=A3, b=b3,
                          scale=jnp.asarray(float(Nb), jnp.float32))
    t0 = time.perf_counter()
    x3, i3 = deep_solve_pd(
        jnp.zeros(nb, jnp.float32), F3,
        g=NormL1(lam=jnp.asarray(p3.lam1, jnp.float32)),
        h=NormL1(lam=jnp.asarray(p3.lam2, jnp.float32)),
        K=FirstDifference(), N=Nb,
        chunk=4096, chunk_steps=256, max_steps=8192)
    _sync = float(x3[0])  # noqa: F841
    dt3 = time.perf_counter() - t0
    d64 = np.asarray(x3, np.float64) - p3.x_star
    d_hi = np.asarray(d64, np.float32)
    d_lo = np.asarray(d64 - d_hi.astype(np.float64), np.float32)
    gap_q3 = float(quad_gap(A3, y3, jnp.asarray(d_hi),
                            jnp.asarray(d_lo), 4096))
    x3_64 = np.asarray(x3, np.float64)
    gap_ns = (p3.lam1 * (np.sum(np.abs(x3_64))
                         - np.sum(np.abs(p3.x_star)))
              + p3.lam2 * (np.sum(np.abs(np.diff(x3_64)))
                           - np.sum(np.abs(np.diff(p3.x_star)))))
    f3 = (0.5 + p3.lam1 * np.sum(np.abs(p3.x_star))
          + p3.lam2 * np.sum(np.abs(np.diff(p3.x_star))))
    rel3 = (gap_q3 + gap_ns) / f3
    log(f"pd deep three-term {Nb}x{nb} [f32 CondatVu+tv_refine3]: rel "
        f"{rel3:.2e} in {dt3:.1f}s ({i3.steps} CV steps, "
        f"certified={i3.certified}; zeros exact="
        f"{bool(np.all(x3_64[p3.x_star == 0] == 0.0))})")


def bench_sparse_e2e(Np=131_072, n_feat=16_384, hot=512, k_hot=24,
                     k_cold=8, p_supp=64, B=2_048, max_chunks=56):
    """Sparse story END-TO-END (VERDICT r3 #4): time-to-rel-1e-3 on a
    PLANTED power-law sparse Lasso under spectral-step FISTA, pure-ELL vs
    hot/cold hybrid — the same operator in both layouts, exact f* by
    KKT construction (utils.make_sparse_lasso_ell with column-norm
    equalization + strict dual slack; a densified comparator is
    physically impossible at rcv1 shapes — 524k×65k dense would be
    137 GB). Also times the raw SAGA step cost per layout, and a
    throughput-only datapoint at the full 524k×65k shape. The hybrid's
    routing win (4.0× per-epoch microbench, PERF.md) must survive at
    solver level — both layouts run the identical trajectory to f32
    rounding, so the ratio is pure layout."""
    import jax
    import jax.numpy as jnp

    from ciao_tpu.prox import NormL1
    from ciao_tpu.solvers.saga import SAGACfg, saga_init, saga_run
    from ciao_tpu.utils.problems import make_sparse_lasso_ell

    log(f"sparse e2e: building planted {Np}x{n_feat} power-law lasso "
        f"(k={k_hot}+{k_cold}, hot={hot}) on device")
    prob = make_sparse_lasso_ell(N=Np, n=n_feat, hot=hot, k_hot=k_hot,
                                 k_cold=k_cold, p=p_supp, rho=1.0, seed=0)
    g = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    Lm = jnp.asarray(float(jnp.max(prob.L)), jnp.float32)
    F_h = prob.hybrid
    target = prob.f_star * (1 + 1e-3)

    @jax.jit
    def cost(F, z):
        r = F.coeff_all(z) / Np
        return 0.5 * jnp.sum(r * r) + prob.lam * jnp.sum(jnp.abs(z))

    # FISTA with the SPECTRAL stepsize is the right solver for this
    # instance: the row-moduli stepsize 1/(3·max L_i) is ~8× too
    # conservative here (Lmax_row 2.4M vs λmax(mean Hessian) 288k —
    # Katyusha at the row-L step needed >2700 epochs and stalled in the
    # tail; FISTA at 0.95/λ̂ reaches rel 1e-3 in ~50 passes). Both
    # layouts run the IDENTICAL deterministic trajectory, so the
    # time-to-target ratio is pure layout.
    @jax.jit
    def hv_pass(F, v):
        return (F.grad_sum_all(v)
                - F.grad_sum_all(jnp.zeros_like(v))) / Np

    from ciao_tpu.solvers.fb import FBCfg, fb_init, fb_run

    v = jax.random.normal(jax.random.PRNGKey(1), (n_feat,), jnp.float32)
    v = v / jnp.linalg.norm(v)
    for _ in range(8):
        hv = hv_pass(F_h, v)
        lam_h = float(jnp.linalg.norm(hv))
        v = hv / lam_h
    gam_f = jnp.asarray(0.95 / lam_h, jnp.float32)
    key = jax.random.PRNGKey(0)
    x0s = jnp.zeros(n_feat, jnp.float32)
    results = {}
    fcfg = FBCfg(N=Np, fast=True)
    for name, F in (("ell", prob.ell), ("hybrid", F_h)):
        st = fb_init(F, g, x0s, gam_f, fcfg)
        _ = float(fb_run(F, g, st, fcfg, 25).x[0])  # warm
        _ = float(cost(F_h, st.x))
        st = fb_init(F, g, x0s, gam_f, fcfg)
        t_solve, passes, reached = 0.0, 0, False
        for _c in range(max_chunks):
            t0 = time.perf_counter()
            st = fb_run(F, g, st, fcfg, 25)
            _ = float(st.x[0])
            t_solve += time.perf_counter() - t0
            passes += 25
            if float(cost(F_h, st.x)) <= target:
                reached = True
                break
        results[name] = (t_solve, passes, reached)
        log(f"sparse e2e fista [{name}]: "
            f"{'reached' if reached else 'NOT reached'} rel 1e-3 in "
            f"{t_solve:.1f}s ({passes} full passes)")
        assert reached, f"sparse e2e [{name}]: planted target not reached"

        # raw SAGA step cost per layout (the routing-bound datapoint)
        scfg = SAGACfg(N=Np, sag=False, batch=B, block=True, coeff=True)
        sts = saga_init(F, g, x0s, (1.0 / (3.0 * Lm)).astype(jnp.float32),
                        key, scfg)
        S = 4096
        sts2 = saga_run(F, g, sts, scfg, S)
        _ = float(sts2.z[0])
        t0 = time.perf_counter()
        sts2 = saga_run(F, g, sts, scfg, S)
        _ = float(sts2.z[0])
        dt = time.perf_counter() - t0
        log(f"sparse saga step [{name}]: {dt / S * 1e3:.3f} ms/step")
    speedup = results["ell"][0] / max(results["hybrid"][0], 1e-9)
    log(f"sparse e2e: hybrid time-to-target speedup {speedup:.2f}x "
        f"(routing microbench was 4.0x)")

    # throughput-only datapoint at the FULL rcv1 shape (524k×65k,
    # ~0.1% density): per-SAGA-step cost per layout — convergence runs
    # there would take tens of minutes on the ELL layout, which is
    # exactly the point of the hybrid
    del prob, F_h
    Np2, nf2 = 524_288, 65_536
    prob2 = make_sparse_lasso_ell(N=Np2, n=nf2, hot=1024, k_hot=48,
                                  k_cold=16, p=p_supp, rho=1.0, seed=0)
    Lm2 = jnp.asarray(float(jnp.max(prob2.L)), jnp.float32)
    x02 = jnp.zeros(nf2, jnp.float32)
    for name, F in (("ell", prob2.ell), ("hybrid", prob2.hybrid)):
        scfg = SAGACfg(N=Np2, sag=False, batch=4_096, block=True,
                       coeff=True)
        sts = saga_init(F, g, x02,
                        (1.0 / (3.0 * Lm2)).astype(jnp.float32), key,
                        scfg)
        S = 512 if name == "ell" else 2048
        sts2 = saga_run(F, g, sts, scfg, S)
        _ = float(sts2.z[0])
        t0 = time.perf_counter()
        sts2 = saga_run(F, g, sts, scfg, S)
        _ = float(sts2.z[0])
        dt = time.perf_counter() - t0
        log(f"sparse saga step 524kx65k [{name}]: "
            f"{dt / S * 1e3:.3f} ms/step")
    return results


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

        # ---- beyond-reference families (all fused; PERF.md round-2
        # table) — one timed row per family per storage ----
        from ciao_tpu.prox import Zero as _Zero
        from ciao_tpu.solvers.fb import FBCfg, fb_init, fb_run
        from ciao_tpu.solvers.katyusha import (
            KatyushaCfg, katyusha_init, katyusha_run,
        )
        from ciao_tpu.solvers.lsvrg import (
            LKatyushaCfg, LSVRGCfg, lkatyusha_init, lkatyusha_run,
            lsvrg_init, lsvrg_run,
        )
        from ciao_tpu.solvers.point_saga import (
            PointSAGACfg, point_saga_init, point_saga_run,
        )
        from ciao_tpu.solvers.sarah import SARAHCfg, sarah_init, sarah_run

        Lm = jnp.max(L)
        half = jnp.asarray(0.5, jnp.float32)
        kcfg = KatyushaCfg(N=N, batch=BATCH, m=m, block=True, ns=True,
                           fused=True)
        st = katyusha_init(F, g, x0, Lm, half, half, key, kcfg)
        st2 = katyusha_run(F, g, st, kcfg, EP)
        _ = float(st2.x_tilde[0])
        t0 = time.perf_counter()
        st2 = katyusha_run(F, g, st, kcfg, EP)
        _ = float(st2.x_tilde[0])
        dt = time.perf_counter() - t0
        log(f"katyusha fused [{tag}]: {dt / EP * 1e3:.2f} ms/outer "
            f"({EP * (2 * m * BATCH + N) / dt / 1e6:.1f} M grad-evals/s)")

        scfg2 = SARAHCfg(N=N, batch=BATCH, m=m, block=True, fused=True)
        st = sarah_init(F, g, x0, (1.0 / (2 * Lm)).astype(jnp.float32),
                        jnp.asarray(1.0, jnp.float32), key, scfg2)
        st2 = sarah_run(F, g, st, scfg2, EP)
        _ = float(st2.x_tilde[0])
        t0 = time.perf_counter()
        st2 = sarah_run(F, g, st, scfg2, EP)
        _ = float(st2.x_tilde[0])
        dt = time.perf_counter() - t0
        log(f"sarah fused [{tag}]: {dt / EP * 1e3:.2f} ms/outer "
            f"({EP * (2 * m * BATCH + N) / dt / 1e6:.1f} M grad-evals/s)")

        pcfg = PointSAGACfg(N=N, batch=BATCH, block=True, fused=True)
        st = point_saga_init(F, _Zero(), x0,
                             (1.0 / (3 * Lm)).astype(jnp.float32), key, pcfg)
        # >=0.25 s of device work even on int8 (~0.0067 ms/step)
        S = 768 * STEPS_PER_EPOCH
        st2 = point_saga_run(F, _Zero(), st, pcfg, S)
        _ = float(st2.x[0])
        t0 = time.perf_counter()
        st2 = point_saga_run(F, _Zero(), st, pcfg, S)
        _ = float(st2.x[0])
        dt = time.perf_counter() - t0
        log(f"point-saga fused [{tag}]: {dt / S * 1e3:.4f} ms/step "
            f"({S * BATCH / dt / 1e6:.0f} M samples/s)")

        p = jnp.asarray(BATCH / N, jnp.float32)
        lcfg = LSVRGCfg(N=N, batch=BATCH, block=True, fused=True)
        st = lsvrg_init(F, g, x0, (1.0 / (6 * Lm)).astype(jnp.float32),
                        p, key, lcfg)
        S = 24576  # >=0.25 s even at int8's ~0.016 ms/step
        st2 = lsvrg_run(F, g, st, lcfg, S)
        _ = float(st2.w[0])
        t0 = time.perf_counter()
        st2 = lsvrg_run(F, g, st, lcfg, S)
        _ = float(st2.w[0])
        dt = time.perf_counter() - t0
        log(f"lsvrg fused [{tag}] (p=B/N): {dt / S * 1e3:.4f} ms/step "
            f"({S * 2 * BATCH / dt / 1e6:.0f} M grad-evals/s)")

        lkcfg = LKatyushaCfg(N=N, batch=BATCH, block=True, fused=True)
        st = lkatyusha_init(F, g, x0, Lm, jnp.zeros((), jnp.float32),
                            jnp.asarray(1 / 3, jnp.float32), half, p, key,
                            lkcfg)
        st2 = lkatyusha_run(F, g, st, lkcfg, S)
        _ = float(st2.y[0])
        t0 = time.perf_counter()
        st2 = lkatyusha_run(F, g, st, lkcfg, S)
        _ = float(st2.y[0])
        dt = time.perf_counter() - t0
        log(f"lkatyusha fused [{tag}] (p=B/N): {dt / S * 1e3:.4f} ms/step "
            f"({S * 2 * BATCH / dt / 1e6:.0f} M grad-evals/s)")

        from ciao_tpu.solvers.ssnm import SSNMCfg, ssnm_init, ssnm_run

        smcfg = SSNMCfg(N=N, batch=BATCH, fused=True)
        tau_s = jnp.asarray(0.5, jnp.float32)
        eta_s = (1.0 / (3.0 * 0.5 * Lm)).astype(jnp.float32)
        st = ssnm_init(F, g, x0, tau_s, eta_s, key, smcfg)
        S = 512 * STEPS_PER_EPOCH
        st2 = ssnm_run(F, g, st, smcfg, S)
        _ = float(st2.x[0])
        t0 = time.perf_counter()
        st2 = ssnm_run(F, g, st, smcfg, S)
        _ = float(st2.x[0])
        dt = time.perf_counter() - t0
        log(f"ssnm fused [{tag}]: {dt / S * 1e3:.4f} ms/step "
            f"({S * BATCH / dt / 1e6:.0f} M samples/s)")

        fcfg = FBCfg(N=N, fast=True, fused=True)
        st = fb_init(F, g, x0, (1.0 / jnp.mean(L)).astype(jnp.float32), fcfg)
        S = 600  # >=0.25 s even at int8's ~0.49 ms/step
        st2 = fb_run(F, g, st, fcfg, S)
        _ = float(st2.x[0])
        t0 = time.perf_counter()
        st2 = fb_run(F, g, st, fcfg, S)
        _ = float(st2.x[0])
        dt = time.perf_counter() - t0
        log(f"fista fused [{tag}]: {dt / S * 1e3:.3f} ms/step "
            f"({S * N / dt / 1e6:.0f} M grad-evals/s; full pass/step)")

        # ProShI (sharing formulation): table-bound fused path
        from ciao_tpu.prox import IndBox
        from ciao_tpu.solvers.proshi import (
            ProshiCfg, proshi_init, proshi_run,
        )

        if tag == "f32":  # the s table stays f32; A storage trims 1/3
            Np2 = 65_536
            A2 = A[:Np2]
            b2v = b[:Np2]
            Fp2 = LeastSquaresRows(
                A=A2, b=b2v, scale=jnp.asarray(float(Np2), jnp.float32)
            )
            L2 = jnp.sum(A2 * A2, axis=1) * Np2
            gsh = IndBox(lo=-jnp.inf, hi=1.0)
            pcfg2 = ProshiCfg(N=Np2, batch=BATCH, sweeping=2, alpha=0.999,
                              fused=True)
            gam2 = (0.999 * Np2 / L2).astype(jnp.float32)
            st = proshi_init(Fp2, gsh, x0, gam2, key, pcfg2)
            S = 8192
            st2 = proshi_run(Fp2, gsh, st, pcfg2, S)
            _ = float(st2.z[0])
            st = proshi_init(Fp2, gsh, x0, gam2, key, pcfg2)
            t0 = time.perf_counter()
            st2 = proshi_run(Fp2, gsh, st, pcfg2, S)
            _ = float(st2.z[0])
            dt = time.perf_counter() - t0
            log(f"proshi fused [65k blocks, f32]: {dt / S * 1e3:.4f} "
                f"ms/step ({S * BATCH / dt / 1e6:.0f} M block-updates/s)")

    staged_time_to_target()

    # Katyusha (beyond the reference): same time-to-target benchmark as
    # the staged SAGA rows above — acceleration pays in EPOCHS, so wall
    # time competes with narrow-storage SAGA despite identical per-step
    # bandwidth (one block row-read per inner step).
    from ciao_tpu.solvers.katyusha import (
        KatyushaCfg, katyusha_init, katyusha_run,
    )
    from ciao_tpu.utils.problems import make_lasso

    Np, npx = 65_536, 1_024
    prob = make_lasso(N=Np, n=npx, p=64, seed=0, dtype=jnp.float32,
                      well_conditioned=True)
    Ap = jnp.asarray(prob.A, jnp.float32)
    bp = jnp.asarray(prob.b, jnp.float32)
    Fp = LeastSquaresRows(A=Ap, b=bp, scale=jnp.asarray(float(Np), jnp.float32))
    gp = NormL1(lam=jnp.asarray(prob.lam, jnp.float32))
    target = prob.f_star + 1e-3 * abs(prob.f_star)

    @jax.jit
    def cost_fn(A, b, z):
        r = jnp.dot(A, z, precision=jax.lax.Precision.HIGHEST) - b
        return 0.5 * jnp.sum(r * r) + prob.lam * jnp.sum(jnp.abs(z))

    mk = 2 * Np // BATCH
    kcfg = KatyushaCfg(N=Np, batch=BATCH, m=mk, block=True, ns=True,
                       fused=True)
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

    # SVRG++ local-inner FUSED (round 4): the doubling m runs a dynamic
    # number of K=64-step launches — per-inner-step cost must sit at the
    # fused-kernel class rate (~0.03 ms/step f32), ~2.2x the unfused
    # local path
    m0 = 64
    Fd = shard_finite_sum(F32, mesh1)   # the tag loop left Fd on int8
    for fused_pp in (False, True):
        cfgpp = DPCfg(N=N, D=1, b_loc=BATCH, sweeping=Sweep.RANDOM,
                      alpha=0.999, plus=True, block=True, coeff=fused_pp,
                      local=True, fused=fused_pp, m_inner=0)
        init_c, _, run_c, _ = build_dp_functions("svrg", mesh1, Fd, g,
                                                 cfgpp,
                                                 extra_init_scalars=1)
        stpp = init_c(Fd, g, x0, (1.0 / (10.0 * jnp.max(L))).astype(
            jnp.float32), jnp.asarray(m0, jnp.int32), key)
        st2 = run_c(Fd, g, stpp, 8)
        _ = float(st2.z_full[0])
        t0 = time.perf_counter()
        st2 = run_c(Fd, g, stpp, 8)
        _ = float(st2.z_full[0])
        dt = time.perf_counter() - t0
        inner = m0 * (2 ** 8 - 1)
        log(f"svrg++ local-inner D=1 [fused={fused_pp}]: "
            f"{dt / inner * 1e3:.4f} ms/inner-step "
            f"({inner * BATCH / dt / 1e6:.0f} M samples/s; m 64->8192)")


def main():
    global _headline_printed
    t_start = time.monotonic()
    _start_watchdog()
    if not probe_backend():
        # a dead tunnel must cost MINUTES, not the driver's whole budget
        # (round 4 lost every perf number to a silent ~50-minute stall)
        sys.exit(2)
    # the TPU tunnel occasionally drops the first connection — retry once,
    # but only re-probe + retry while the watchdog budget still has room
    # for a full measurement pass
    # CPU baseline first: pure numpy, tunnel-independent, and needed for
    # the headline's vs_baseline — so the headline JSON can flush the
    # moment the TPU measurement lands
    cpu = cpu_baseline_samples_per_s()
    log(f"CPU batch-1 baseline: {cpu:,.0f} samples/s")
    try:
        tpu = tpu_samples_per_s()
    except Exception as e:  # noqa: BLE001
        log(f"TPU run failed ({type(e).__name__}: {e}); re-probing + "
            "retrying once")
        if not probe_backend():
            sys.exit(2)
        tpu = tpu_samples_per_s()
    print(
        json.dumps(
            {
                "metric": "saga_samples_per_s",
                "value": round(tpu, 1),
                "unit": "samples/s",
                "vs_baseline": round(tpu / cpu, 2),
            }
        ),
        flush=True,
    )
    _headline_printed = True
    log(f"headline flushed at t+{time.monotonic() - t_start:.0f}s "
        f"(deadline {BENCH_DEADLINE_S:.0f}s)")
    if os.environ.get("CIAO_BENCH_ALL"):
        tpu_samples_per_s(storage="f32")  # exact-f32 path (stderr)
        bench_secondary()
        bench_missing_cells()
        bench_sparse_e2e()
        bench_sharing_deep()
        bench_pd_deep()
    # BASELINE.md anchors, machine-captured every round as secondary
    # JSON lines (the driver consumes the FIRST line; these are for the
    # record). Each is fenced: a tunnel hiccup here must not cost the
    # round its headline.
    try:
        eps = lfinito_10m_epochs_per_s("int8")
        print(json.dumps({
            "metric": "lfinito_10m_epochs_per_s", "value": round(eps, 1),
            "unit": "epochs/s", "vs_baseline": None,
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"10M anchor failed ({type(e).__name__}: {e}) — skipped")
    try:
        staged = staged_time_to_target(plans=("int8->f32 two-stage",))
        dt, reached, epochs = staged["int8->f32 two-stage"]
        cpu_s = epochs * 65_536 / max(cpu, 1.0)
        print(json.dumps({
            "metric": "time_to_rel1e3_staged_int8_s",
            "value": round(dt, 2), "unit": "s",
            "vs_baseline": round(cpu_s / dt, 1) if reached else None,
            "reached": bool(reached),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"staged anchor failed ({type(e).__name__}: {e}) — skipped")
    # BASELINE.md rows 1-2 on the BASELINE config itself (VERDICT r2
    # #2): time-to-deepest-achievable suboptimality on 10M×100, with
    # the f32 floor and every crossed rel target machine-captured
    try:
        (t_f32, floor_f32, ep_f32, cross_f32, t_stg, floor_stg,
         cross_stg, t_sg, floor_sg, ep_sg, cross_sg, t_pol, gap_pol,
         pol_steps, t_api, gap_api) = deep_target_10m()
        # headline = the BEST plan: streamed-SAGA f32 to its floor
        # (4.1e-5 in ~0.8 s), then the compensated-gradient FISTA
        # polish through rel 1e-6; vs_baseline: the reference's
        # single-core batch-1 loop at the measured ~cpu samples/s would
        # need epochs×N/cpu seconds for the same row reads
        t_total = t_sg + t_pol
        ep_total = ep_sg + 2 * pol_steps  # each FISTA step = 2 passes
        cpu_equiv_s = ep_total * 10 * 1024 * 1024 / max(cpu, 1.0)
        t_quote = (cross_sg[1e-6] if cross_sg[1e-6] is not None
                   else t_total)
        print(json.dumps({
            "metric": "deep_target_10m_time_to_rel1e6_s",
            "value": round(t_quote, 2), "unit": "s",
            "vs_baseline": round(cpu_equiv_s / max(t_quote, 1e-9), 1),
            "solver": "saga_streamed_f32+polish",
            "target_rel": 1e-6,
            "reached_1e6": cross_sg[1e-6] is not None,
            # the PUBLIC deep_solve API, timed end-to-end (one call)
            "deep_api_time_s": round(t_api, 2),
            "deep_api_rel": float(f"{gap_api:.3e}"),
            "floor_rel": float(f"{gap_pol:.3e}"),
            "saga_floor_rel": float(f"{floor_sg:.3e}"),
            "saga_time_s": round(t_sg, 2),
            "polish_time_s": round(t_pol, 2),
            "polish_steps": pol_steps,
            "epochs": ep_total,
            "crossings_s": {f"{t:g}": v for t, v in cross_sg.items()},
            "lfinito_f32_time_s": round(t_f32, 2),
            "floor_rel_lfinito": float(f"{floor_f32:.3e}"),
            "crossings_lfinito_s": {f"{t:g}": v
                                    for t, v in cross_f32.items()},
            "staged_int8_f32_time_s": round(t_stg, 2),
            "floor_rel_staged": float(f"{floor_stg:.3e}"),
            "crossings_staged_s": {f"{t:g}": v
                                   for t, v in cross_stg.items()},
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"deep-target anchor failed ({type(e).__name__}: {e}) — skipped")
    # VERDICT r4 #7: ONE example driver-captured end-to-end on chip at
    # its REAL shape (closing the "examples only smoke-tested on the
    # CPU mesh" gap) — examples/deep_accuracy.py's main() runs the
    # public deep_solve at 1M×128 and asserts its planted-recovery
    # check internally (rel ≤ 1e-6); the JSON line records rel + time
    try:
        import importlib.util as _ilu
        import pathlib as _pl

        spec = _ilu.spec_from_file_location(
            "examples_deep_accuracy",
            _pl.Path(__file__).resolve().parent / "examples"
            / "deep_accuracy.py")
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        t0 = time.perf_counter()
        rel_ex = mod.main()
        print(json.dumps({
            "metric": "example_deep_accuracy_rel",
            "value": float(f"{rel_ex:.3e}"),
            "unit": "rel_suboptimality", "vs_baseline": None,
            "time_s": round(time.perf_counter() - t0, 1),
            "shape": "1Mx128", "passed": bool(rel_ex <= 1e-6),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        log(f"example capture failed ({type(e).__name__}: {e}) — skipped")


if __name__ == "__main__":
    main()
