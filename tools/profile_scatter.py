"""Microbenchmark the gradient-scatter pipeline components on real TPU.

The PRB backward's flush (sort + cumsum + unique scatter) measures ~35 ns per
entry in-loop — this isolates where: the multi-operand sort, the cumsum/ffill,
the conflict-free scatter, or the lax.cond / loop plumbing around it.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

N_BINS = 1024 * 1024


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.tree.map(lambda a: sync(a), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda a: sync(a), out)
    dt = (time.perf_counter() - t0) / iters
    m = args[0].shape[0] if hasattr(args[0], "shape") else 0
    per = dt / max(m, 1) * 1e9
    print(f"{name:>28s}: {dt*1e3:9.2f} ms   ({per:6.1f} ns/entry, M={m})")
    return dt


def main():
    from zdr_tpu.texture import segment_scatter_add

    key = jax.random.PRNGKey(0)
    for M in (262_144, 1_048_576, 4_194_304):
        ids = jax.random.randint(key, (M,), 0, N_BINS, jnp.int32)
        vals = [jax.random.normal(key, (M,), jnp.float32) for _ in range(4)]
        v1 = vals[0]

        print(f"--- M = {M}")
        timeit("segment_scatter_add 4ch", jax.jit(
            lambda i, v: segment_scatter_add(i, list(v), N_BINS, channel_major=True)
        ), ids, tuple(vals))
        timeit("sort 5-operand", jax.jit(
            lambda i, v: jax.lax.sort([i] + list(v), num_keys=1)[0]
        ), ids, tuple(vals))
        timeit("sort 2-operand", jax.jit(
            lambda i, v: jax.lax.sort([i, v], num_keys=1)[0]
        ), ids, v1)
        timeit("sort 1-operand", jax.jit(lambda i: jax.lax.sort(i)), ids)
        # conflict-free scatter (unique, sorted) x4 channels
        uids = jnp.arange(M, dtype=jnp.int32) % N_BINS

        def uscat(i, v):
            outs = []
            for c in range(4):
                outs.append(
                    jnp.zeros((N_BINS,), jnp.float32).at[i].add(
                        v[c], unique_indices=True
                    )
                )
            return jnp.stack(outs)

        timeit("unique scatter x4", jax.jit(uscat), uids, tuple(vals))
        # plain duplicate scatter x4 channels (what XLA does natively)
        def dscat(i, v):
            outs = []
            for c in range(4):
                outs.append(jnp.zeros((N_BINS,), jnp.float32).at[i].add(v[c]))
            return jnp.stack(outs)

        timeit("dup scatter x4 (uniform)", jax.jit(dscat), ids, tuple(vals))
        hot = jnp.zeros((M,), jnp.int32)  # adversarial all-one-texel
        timeit("dup scatter x4 (1 texel)", jax.jit(dscat), hot, tuple(vals))
        # cumsum + ffill part alone
        def ffpart(i, v):
            i2 = jax.lax.sort([i], num_keys=1)[0]
            is_start = jnp.concatenate([jnp.ones((1,), bool), i2[1:] != i2[:-1]])
            def ff_op(a, b):
                av, am = a
                bv, bm = b
                return jnp.where(bm, bv, av), am | bm
            outs = []
            for c in range(4):
                csum = jnp.cumsum(v[c])
                prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), csum[:-1]])
                base = jnp.where(is_start, prev, 0.0)
                ff, _ = jax.lax.associative_scan(ff_op, (base, is_start), axis=0)
                outs.append(csum - ff)
            return jnp.stack(outs)

        timeit("cumsum+ffill x4 (+1op sort)", jax.jit(ffpart), ids, tuple(vals))


if __name__ == "__main__":
    main()
