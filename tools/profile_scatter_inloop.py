"""In-loop (fori_loop) timings of scatter/sort/scan primitives on real TPU.

Standalone per-call timings through the axon tunnel carry ~6 ms of call
overhead; wrapping K reps in a lax.fori_loop measures the true on-device
cost per op — which is what matters inside the PRB while_loop.

Usage: python -u tools/profile_scatter_inloop.py [M] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_BINS = 1024 * 1024
M = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0 - 0.03) / REPS  # ~30ms tunnel sync
    print(f"{name:>26s}: {dt*1e3:9.3f} ms/op", flush=True)
    return dt


def loopify(body):
    """Run body REPS times inside one jit; vary input with the index to
    defeat CSE; accumulate a scalar to defeat DCE."""

    def outer(ids, ch):
        def step(i, acc):
            out = body(ids ^ i, ch)
            return acc + jax.tree.leaves(out)[0].reshape(-1)[0]

        return jax.lax.fori_loop(0, REPS, step, 0.0)

    return jax.jit(outer)


def main():
    rng = np.random.default_rng(0)
    ids_r = jnp.asarray(rng.integers(0, N_BINS, M), jnp.int32)
    ids_same = jnp.zeros((M,), jnp.int32)
    ch = jnp.asarray(rng.random((4, M)), jnp.float32)

    def dup4(i, c):
        i = jnp.clip(i, 0, N_BINS - 1)
        return [jnp.zeros((N_BINS,), jnp.float32).at[i].add(c[k]) for k in range(4)]

    def dup1(i, c):
        i = jnp.clip(i, 0, N_BINS - 1)
        return jnp.zeros((N_BINS,), jnp.float32).at[i].add(c[0])

    def uniq_set1(i, c):
        i = jnp.clip(i, 0, N_BINS - 1)
        return jnp.zeros((N_BINS,), jnp.float32).at[i].set(
            c[0], unique_indices=True
        )

    def uniq_add1(i, c):
        i = jnp.clip(i, 0, N_BINS - 1)
        return jnp.zeros((N_BINS,), jnp.float32).at[i].add(
            c[0], unique_indices=True
        )

    def sort5(i, c):
        return jax.lax.sort([i] + [c[k] for k in range(4)], num_keys=1)[0]

    def sort1(i, c):
        return jax.lax.sort([i], num_keys=1)[0]

    def cumsum2d(i, c):
        return jnp.cumsum(c + i.astype(jnp.float32)[None, :] * 0, axis=1)

    def ff2d(i, c):
        is_start = jnp.concatenate([jnp.ones((1,), bool), i[1:] != i[:-1]])

        def op(a, b):
            av, am = a
            bv, bm = b
            return jnp.where(bm, bv, av), am | bm

        base = jnp.where(is_start[None, :], c, 0.0)
        m2 = jnp.broadcast_to(is_start[None, :], c.shape)
        ff, _ = jax.lax.associative_scan(op, (base, m2), axis=1)
        return ff

    def cummax_gather(i, c):
        is_start = jnp.concatenate([jnp.ones((1,), bool), i[1:] != i[:-1]])
        pos = jnp.arange(M, dtype=jnp.int32)
        start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, pos, 0))
        return c[:, start]

    def pack2(i, c):
        a = c[0].astype(jnp.bfloat16)
        b = c[1].astype(jnp.bfloat16)
        u = (
            jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32) << 16
        ) | jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(u, jnp.float32)

    print(f"M={M} reps={REPS}", flush=True)
    timeit("dup_add x1 random", loopify(dup1), ids_r, ch)
    timeit("dup_add x1 same-id", loopify(dup1), ids_same, ch)
    timeit("dup_add x4 random", loopify(dup4), ids_r, ch)
    timeit("uniq_set x1", loopify(uniq_set1), ids_r, ch)
    timeit("uniq_add x1", loopify(uniq_add1), ids_r, ch)
    timeit("sort1", loopify(sort1), ids_r, ch)
    timeit("sort5", loopify(sort5), ids_r, ch)
    timeit("cumsum_2d", loopify(cumsum2d), ids_r, ch)
    timeit("assoc_ff_2d", loopify(ff2d), ids_r, ch)
    timeit("cummax+gather4", loopify(cummax_gather), ids_r, ch)
    timeit("pack_bf16x2", loopify(pack2), ids_r, ch)


if __name__ == "__main__":
    main()
