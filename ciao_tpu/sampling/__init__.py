"""On-device index schedules.

Replaces the reference's host-global RNG sampling —
``sample(1:N, batch, replace=false)`` (Finito_basic.jl:97),
``randperm`` (Finito_basic.jl:102), ``rand(1:N)`` (SAGA_basic.jl:55) —
with explicit ``jax.random`` keys threaded through solver state:
deterministic, checkpoint-resumable, and foldable per host/shard.

Sweeping strategies (reference ``Finito.jl:153``):
  1 = uniformly random (without replacement within a minibatch)
  2 = cyclic over static contiguous blocks
  3 = shuffled block order, re-shuffled every epoch

Behavioral parity notes (SURVEY.md §2.1):
  * blocks are STATIC contiguous ranges of size ``batch`` with a ragged
    final block (Finito_basic.jl:50-58); `mask` flags the valid lanes.
  * in shuffled mode the FIRST epoch runs in natural (cyclic) order —
    the reference initializes ``inds = 1:d`` and only reshuffles once a
    full epoch has been consumed (Finito_basic.jl:100-107).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Sweep(enum.IntEnum):
    RANDOM = 1
    CYCLIC = 2
    SHUFFLED = 3


class SweepState(NamedTuple):
    """Index-schedule carry; all fields are device scalars/arrays."""

    pos: jnp.ndarray       # 1-based position within the current epoch
    order: jnp.ndarray     # (d,) current block order (0-based block ids)
    key: jnp.ndarray       # PRNG key


def num_blocks(n: int, batch: int) -> int:
    return -(-n // batch)  # ceil


def init_sweep(key, n: int, batch: int, sweeping: int = Sweep.RANDOM) -> SweepState:
    d = num_blocks(n, batch)
    # cyclic carries the reference's 1-based ``idxr`` (init 1 →
    # first step lands on block 2, Finito_basic.jl:99 with init :44);
    # shuffled carries ``idx`` (init 0 → first epoch in natural order).
    pos0 = 1 if sweeping == Sweep.CYCLIC else 0
    return SweepState(
        pos=jnp.asarray(pos0, jnp.int32),
        order=jnp.arange(d, dtype=jnp.int32),
        key=key,
    )


def next_block_id(
    state: SweepState, n: int, batch: int, sweeping: int
) -> Tuple[jnp.ndarray, SweepState]:
    """Advance a cyclic/shuffled schedule one step, returning the
    0-based BLOCK id — the TPU fast path consumes ``block * batch`` as a
    dynamic-slice start (contiguous blocks avoid XLA's slow TPU row
    scatter; see oracles.base block entry points)."""
    d = num_blocks(n, batch)
    if sweeping == Sweep.RANDOM:
        # stateless iid uniform block id: deterministic in (key, pos) so
        # the fused drivers can draw/clamp whole windows in one
        # vectorized pass (gen_block_ids / gen_block_ids_clamped) while
        # reproducing this stepwise stream bit-for-bit. ``pos`` is a
        # plain draw counter here (no epoch wrap).
        k = jax.random.fold_in(state.key, state.pos)
        j = jax.random.randint(k, (), 0, d, dtype=jnp.int32)
        return j, state._replace(pos=state.pos + 1)
    if sweeping == Sweep.CYCLIC:
        new_pos = state.pos % d + 1  # reference: idxr = mod(idxr, d) + 1
        return new_pos - 1, state._replace(pos=new_pos)

    if sweeping == Sweep.SHUFFLED:
        # reference semantics: when pos == d, draw a fresh permutation and
        # restart at position 1; otherwise advance (Finito_basic.jl:100-107).
        def reshuffle(op):
            order, pos, key = op
            key, sub = jax.random.split(key)
            return jax.random.permutation(sub, d).astype(jnp.int32), jnp.ones((), jnp.int32), key

        def advance(op):
            order, pos, key = op
            return order, pos + 1, key

        order, pos, key = jax.lax.cond(
            state.pos == d, reshuffle, advance, (state.order, state.pos, state.key)
        )
        return order[pos - 1], SweepState(pos=pos, order=order, key=key)

    raise ValueError(f"block schedules need sweeping 2 or 3; got {sweeping}")


def next_block(
    state: SweepState, n: int, batch: int, sweeping: int
) -> Tuple[jnp.ndarray, jnp.ndarray, SweepState]:
    """Advance the schedule one step.

    Returns ``(idx, mask, new_state)`` with ``idx`` an (batch,)-shaped
    int32 index vector and ``mask`` the valid-lane booleans.
    """
    if sweeping == Sweep.RANDOM:
        key, sub = jax.random.split(state.key)
        idx = jax.random.choice(sub, n, (batch,), replace=False).astype(jnp.int32)
        mask = jnp.ones((batch,), bool)
        return idx, mask, state._replace(key=key)

    block, new_state = next_block_id(state, n, batch, sweeping)
    idx = block * batch + jnp.arange(batch, dtype=jnp.int32)
    mask = idx < n
    idx = jnp.minimum(idx, n - 1)
    return idx, mask, new_state


def uniform_index(key, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single uniform index (SAGA/SVRG inner sampling, SAGA_basic.jl:55)."""
    key, sub = jax.random.split(key)
    return jax.random.randint(sub, (), 0, n, dtype=jnp.int32), key


def _random_window(state: SweepState, k: int, d: int):
    """The k iid uniform block ids at draw positions pos..pos+k-1 —
    stateless fold_in(key, position) draws, ≡ k calls of the RANDOM
    branch of :func:`next_block_id`."""
    s = state.pos + jnp.arange(k, dtype=jnp.int32)
    keys = jax.vmap(lambda t: jax.random.fold_in(state.key, t))(s)
    return jax.vmap(
        lambda kk: jax.random.randint(kk, (), 0, d, dtype=jnp.int32)
    )(keys)


def _shuffled_window(state: SweepState, k: int, d: int):
    """The k shuffled block ids at positions pos..pos+k-1 plus the
    permutation/key chains needed to advance the state by ANY committed
    count c ≤ k: epoch e uses the e'th permutation; each epoch boundary
    advances the key by one split (exactly as next_block_id's
    reshuffle). Returns (blocks, orders, keys_all) where the state
    advanced by c is SweepState(pos=(pos+c-1)%d+1, order=orders[r],
    key=keys_all[r]) with r = (pos+c-1)//d boundaries crossed. Chain
    entries beyond the boundaries actually crossed are computed but
    never committed."""
    s = state.pos + jnp.arange(k, dtype=jnp.int32)
    E = k // d + 2
    e = s // d
    q = s % d

    def chain(key, _):
        key2, sub = jax.random.split(key)
        return key2, (key2, sub)

    _, (keys_next, subs) = jax.lax.scan(chain, state.key, None, length=E)
    perms = jax.vmap(
        lambda sk: jax.random.permutation(sk, d).astype(jnp.int32)
    )(subs)
    orders = jnp.concatenate([state.order[None, :], perms], axis=0)
    keys_all = jnp.concatenate([state.key[None], keys_next], axis=0)
    return orders[e, q], orders, keys_all


def gen_block_ids(
    state: SweepState, k: int, n: int, batch: int, sweeping: int
) -> Tuple[jnp.ndarray, SweepState]:
    """The next ``k`` block ids of a schedule in ONE vectorized draw,
    plus the advanced state — bit-identical to ``k`` calls of
    :func:`next_block_id` (used by the fused multi-step drivers; a
    sequential scan costs ~1 scalar round per step, which rivals the
    fused kernels' whole step time)."""
    d = num_blocks(n, batch)
    if sweeping == Sweep.RANDOM:
        return _random_window(state, k, d), state._replace(
            pos=state.pos + k
        )
    new_pos = (state.pos + k - 1) % d + 1
    if sweeping == Sweep.CYCLIC:
        s = state.pos + jnp.arange(k, dtype=jnp.int32)
        return s % d, state._replace(pos=new_pos)
    if sweeping != Sweep.SHUFFLED:
        raise ValueError(f"block schedules need sweeping 2 or 3; got {sweeping}")
    blocks, orders, keys_all = _shuffled_window(state, k, d)
    n_resh = (state.pos + k - 1) // d   # boundaries crossed in the window
    return blocks, SweepState(
        pos=new_pos, order=orders[n_resh], key=keys_all[n_resh]
    )


def clip_block_distribution(q, K: int):
    """Water-fill-clip a block distribution so no block carries more
    than 1/K mass: the LARGEST c with q̃ ∝ min(q, c) satisfying
    max q̃ = c/Σmin(q, c) ≤ 1/K (clips as little as possible; at the
    solution Σmin(q, c) = K·c exactly, so every clipped block sits at
    exactly 1/K).

    Why: the STRATIFIED importance schedule (slot k of a K-window draws
    u = (k+U)/K against the inverse CDF) is distinct-by-construction
    within a window iff every block's interval is no longer than the
    1/K slot width — that's what lets importance-sampled SAGA ride the
    streamed-table fused kernel at any N, where iid draws would
    birthday-collapse the clamp (VERDICT r3 #2). The clipped q̃ is the
    classic TRUNCATED importance distribution: hot blocks cap at ~one
    visit per window (their 1/(d·q̃) weights bottom out at K/d — the
    variance-bounding property of truncation).

    Host-side, float64 (f32 cumsums over many blocks skew the realized
    draws — see the facade's CDF note). Returns ``(q_tilde, clipped)``
    with ``q_tilde`` summing to 1 and ``clipped`` the number of blocks
    at the cap (0 = no clipping was needed).
    """
    import numpy as np

    q = np.asarray(q, np.float64)
    d = q.size
    K = min(K, d)
    Z0 = q.sum()
    if q.max() * K <= Z0:
        return q / Z0, 0
    qs = np.sort(q)[::-1]
    css = np.cumsum(qs)
    total = css[-1]
    for m in range(1, K):
        c = (total - css[m - 1]) / (K - m)
        lo = qs[m] if m < d else 0.0
        if lo <= c < qs[m - 1]:
            qt = np.minimum(q, c)
            return qt / qt.sum(), int(np.sum(q > c))
    # degenerate spectrum (q concentrated on < K blocks): uniform is
    # the only distribution with max mass ≤ 1/K ≤ 1/d... reachable only
    # when K == d, where stratification covers every block each window
    return np.full(d, 1.0 / d), d


def first_duplicate(blocks):
    """Smallest j with ``blocks[j] in blocks[:j]``, else len(blocks) —
    the clamp point for fused drivers whose kernels stream a table
    through in/out aliasing and therefore cannot tolerate a same-launch
    block revisit (ops.proshi_multistep's hazard contract)."""
    K = blocks.shape[0]
    eq = blocks[:, None] == blocks[None, :]           # eq[j, i]
    earlier = jnp.tril(jnp.ones((K, K), bool), -1)    # i < j
    dup = jnp.any(eq & earlier, axis=1)               # (K,) j has earlier twin
    return jnp.where(jnp.any(dup), jnp.argmax(dup), K).astype(jnp.int32)


def gen_block_ids_clamped(
    state: SweepState, k: int, n: int, batch: int, sweeping: int
) -> Tuple[jnp.ndarray, jnp.ndarray, SweepState]:
    """The next ``k`` CANDIDATE block ids plus the clamp count ``f`` =
    the largest prefix with all-distinct blocks, and the state advanced
    by ``f`` draws ONLY. Because every schedule is stateless in
    (key, position), the ``k - f`` discarded candidates are re-drawn
    identically by the next call — so consuming f steps per launch
    reproduces the stepwise ``next_block_id`` stream bit-for-bit.
    Shuffled epochs are permutations, so f < k only when the window
    crosses an epoch boundary AND the fresh permutation's head collides
    with the old tail; random (iid) windows clamp at the birthday bound
    ~1.25·sqrt(d). Cyclic windows with k <= d never clamp — use
    :func:`gen_block_ids` there."""
    d = num_blocks(n, batch)
    if sweeping == Sweep.RANDOM:
        blocks = _random_window(state, k, d)
        f = first_duplicate(blocks)
        return blocks, f, state._replace(pos=state.pos + f)
    if sweeping != Sweep.SHUFFLED:
        raise ValueError(
            f"gen_block_ids_clamped serves sweeping 1 or 3; got {sweeping}"
        )
    blocks, orders, keys_all = _shuffled_window(state, k, d)
    f = first_duplicate(blocks)
    n_resh = (state.pos + f - 1) // d   # boundaries crossed in the COMMIT
    new_pos = (state.pos + f - 1) % d + 1
    return blocks, f, SweepState(
        pos=new_pos, order=orders[n_resh], key=keys_all[n_resh]
    )
