"""Gather-rate microbenchmark on real TPU: rows/s vs row width, dtype, and
table size (in-loop fori_loop timing; the texture fetch is the hottest
single op in the path tracer at ~4.6 ns/row for 64B rows).

Usage: python -u tools/profile_gather.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N = 262_144
REPS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0 - 0.03) / REPS
    print(f"{name:>34s}: {dt*1e3:8.3f} ms  ({dt/N*1e9:6.2f} ns/row)", flush=True)


def bench_gather(table, ids):
    def outer(t, i):
        def step(k, acc):
            rows = t[(i + k) % t.shape[0]]
            return acc + rows.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))

    return jax.jit(outer)


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1023 * 1023, N), jnp.int32)

    for rows, width, dtype, label in [
        (1023 * 1023, 16, jnp.float32, "1M x 16 f32 (64B, current)"),
        (1023 * 1023, 8, jnp.float32, "1M x 8 f32 (32B)"),
        (1023 * 1023, 4, jnp.float32, "1M x 4 f32 (16B)"),
        (1023 * 1023, 2, jnp.float32, "1M x 2 f32 (8B)"),
        (1023 * 1023, 16, jnp.bfloat16, "1M x 16 bf16 (32B)"),
        (1023 * 1023, 8, jnp.bfloat16, "1M x 8 bf16 (16B)"),
        (255 * 255, 16, jnp.float32, "65k x 16 f32 (64B, small tbl)"),
        (1023 * 1023, 32, jnp.float32, "1M x 32 f32 (128B)"),
    ]:
        table = jnp.asarray(rng.random((rows, width)), dtype)
        i = ids % rows
        timeit(label, bench_gather(table, i), table, i)

    # 1D scalar gather for comparison
    t1 = jnp.asarray(rng.random(1023 * 1023), jnp.float32)

    def outer1(t, i):
        def step(k, acc):
            return acc + t[(i + k) % t.shape[0]][0]

        return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))

    timeit("1M scalar f32 gather", jax.jit(outer1), t1, ids)

    # two half-width gathers (split-table alternative)
    ta = jnp.asarray(rng.random((1023 * 1023, 8)), jnp.float32)
    tb = jnp.asarray(rng.random((1023 * 1023, 8)), jnp.float32)

    def outer2(a, b, i):
        def step(k, acc):
            j = (i + k) % a.shape[0]
            return acc + a[j].reshape(-1)[0] + b[j].reshape(-1)[0]

        return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))

    timeit("2x (1M x 8 f32) gathers", jax.jit(outer2), ta, tb, ids)


if __name__ == "__main__":
    main()
