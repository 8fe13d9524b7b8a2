"""Dissect segment_scatter_add cost on real TPU, and measure candidate
restructures (channel-stacked scan/scatter, perm-sort+gather, batched
scatter) at the flush sizes the PRB backward actually uses.

Usage: python -u tools/profile_scatter2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from zdr_tpu.texture import segment_scatter_add  # noqa: E402

N_BINS = 1024 * 1024


def sync(x):
    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>24s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for M in (262_144, 1_048_576, 4_194_304):
        print(f"--- M = {M}", flush=True)
        ids = jnp.asarray(rng.integers(0, N_BINS, M), jnp.int32)
        chans = [jnp.asarray(rng.random(M), jnp.float32) for _ in range(4)]
        ch_stack = jnp.stack(chans, axis=0)

        timeit(
            "segment_scatter_add",
            jax.jit(lambda i, c: segment_scatter_add(i, [c[k] for k in range(4)], N_BINS, channel_major=True)),
            ids, ch_stack,
        )
        timeit("sort5", jax.jit(lambda i, c: jax.lax.sort([i] + [c[k] for k in range(4)], num_keys=1)[0]), ids, ch_stack)
        timeit("sort2_perm", jax.jit(lambda i: jax.lax.sort([i, jnp.arange(M, dtype=jnp.int32)], num_keys=1)[0]), ids)

        def sort_perm_gather(i, c):
            i2, perm = jax.lax.sort([i, jnp.arange(M, dtype=jnp.int32)], num_keys=1)
            return i2, c[:, perm]

        timeit("sort2+rowgather", jax.jit(sort_perm_gather), ids, ch_stack)

        i2s = jax.jit(lambda i: jax.lax.sort([i], num_keys=1)[0])(ids)
        i2s = jax.block_until_ready(i2s)

        def scans4(c):
            return [jnp.cumsum(c[k]) for k in range(4)]

        timeit("cumsum_x4", jax.jit(scans4), ch_stack)
        timeit("cumsum_2d", jax.jit(lambda c: jnp.cumsum(c, axis=1)), ch_stack)

        def ff_op(a, b):
            av, am = a
            bv, bm = b
            return jnp.where(bm, bv, av), am | bm

        is_start = jnp.concatenate([jnp.ones((1,), bool), i2s[1:] != i2s[:-1]])

        def ffx4(c):
            outs = []
            for k in range(4):
                base = jnp.where(is_start, c[k], 0.0)
                ff, _ = jax.lax.associative_scan(ff_op, (base, is_start), axis=0)
                outs.append(ff)
            return outs

        def ff2d(c):
            base = jnp.where(is_start[None, :], c, 0.0)
            m2 = jnp.broadcast_to(is_start[None, :], c.shape)
            ff, _ = jax.lax.associative_scan(ff_op, (base, m2), axis=1)
            return ff

        timeit("assoc_scan_x4", jax.jit(ffx4), ch_stack)
        timeit("assoc_scan_2d", jax.jit(ff2d), ch_stack)

        is_end = jnp.concatenate([i2s[:-1] != i2s[1:], jnp.ones((1,), bool)])
        pos = jnp.arange(M, dtype=jnp.int32)
        idx_end = jnp.where(is_end, i2s, N_BINS + pos)

        def scat4(c):
            outs = []
            for k in range(4):
                buf = jnp.zeros((N_BINS + M,), jnp.float32)
                outs.append(buf.at[idx_end].add(jnp.where(is_end, c[k], 0.0), unique_indices=True)[:N_BINS])
            return outs

        def scat2d(c):
            buf = jnp.zeros((4, N_BINS + M), jnp.float32)
            vals = jnp.where(is_end[None, :], c, 0.0)
            out = jax.vmap(lambda b, v: b.at[idx_end].add(v, unique_indices=True))(buf, vals)
            return out[:, :N_BINS]

        timeit("unique_scatter_x4", jax.jit(scat4), ch_stack)
        timeit("unique_scatter_2d", jax.jit(scat2d), ch_stack)

        def dup4(i, c):
            return [jnp.zeros((N_BINS,), jnp.float32).at[i].add(c[k]) for k in range(4)]

        timeit("dup_scatter_x4", jax.jit(dup4), ids, ch_stack)

        def dup2d(i, c):
            buf = jnp.zeros((4, N_BINS), jnp.float32)
            return jax.vmap(lambda b, v: b.at[i].add(v))(buf, c)

        timeit("dup_scatter_2d", jax.jit(dup2d), ids, ch_stack)


if __name__ == "__main__":
    main()
