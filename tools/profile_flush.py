"""Profile the PRB splat-flush building blocks on TPU (round 3).

Questions this answers (in-loop timing per the measured cost model —
standalone op timings are swamped by ~6 ms tunnel overhead):
  1. Does a unique-index ROW scatter ((k, C) rows in one op) cost per-entry
     or per-scalar? If per-entry, one (k,4) row scatter beats 2 packed
     scalar scatters AND drops the bf16 quantization.
  2. What does a 3-operand sortA (ids + 2 prepacked bf16-pair payloads)
     save vs the current 5-operand sort?
  3. Where do the current segment_scatter_add4 milliseconds go.
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

M = 1 << 20
NBINS = 1 << 20
K = int(M * 0.375)
REPS = 20


def sync(x):
    return float(jnp.asarray(x).sum())


def inloop(fn, *args):
    """Run fn REPS times inside one device execution; returns seconds/rep."""
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(*a)[:8].sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
    sync(run(*args))  # compile
    t0 = time.time()
    sync(run(*args))
    return (time.time() - t0) / REPS


def main():
    rs = np.random.RandomState(0)
    # compacted-unique-style targets: ascending unique ids then sentinel fill
    uniq = np.sort(rs.choice(NBINS, size=K, replace=False)).astype(np.int32)
    tgt = jnp.asarray(uniq)
    v = jnp.asarray(rs.rand(K).astype(np.float32))
    v2 = jnp.asarray(rs.rand(K, 2).astype(np.float32))
    v4 = jnp.asarray(rs.rand(K, 4).astype(np.float32))

    def scat1(t, x):
        return jnp.zeros((NBINS,), jnp.float32).at[t].set(x, unique_indices=True)

    def scat2(t, x):
        a = jnp.zeros((NBINS,), jnp.float32).at[t].set(x[:, 0], unique_indices=True)
        b = jnp.zeros((NBINS,), jnp.float32).at[t].set(x[:, 1], unique_indices=True)
        return a + b

    def scat_row2(t, x):
        return jnp.zeros((NBINS, 2), jnp.float32).at[t].set(
            x, unique_indices=True
        ).sum(axis=1)

    def scat_row4(t, x):
        return jnp.zeros((NBINS, 4), jnp.float32).at[t].set(
            x, unique_indices=True
        ).sum(axis=1)

    print(f"k={K} rows, {REPS} reps in-loop", flush=True)
    print(f"scalar scatter (k,): {inloop(scat1, tgt, v)*1e3:.2f} ms", flush=True)
    print(f"2x scalar scatter:   {inloop(scat2, tgt, v2)*1e3:.2f} ms", flush=True)
    print(f"row scatter (k,2):   {inloop(scat_row2, tgt, v2)*1e3:.2f} ms", flush=True)
    print(f"row scatter (k,4):   {inloop(scat_row4, tgt, v4)*1e3:.2f} ms", flush=True)

    ids = jnp.asarray(rs.randint(0, NBINS, size=M).astype(np.int32))
    c = [jnp.asarray(rs.rand(M).astype(np.float32)) for _ in range(4)]

    def sort5(ids, c0, c1, c2, c3):
        return jax.lax.sort([ids, c0, c1, c2, c3], num_keys=1)[1]

    def sort3(ids, c0, c1, c2, c3):
        from zdr_tpu.texture import pack_bf16_pair
        p01 = pack_bf16_pair(c0, c1)
        p23 = pack_bf16_pair(c2, c3)
        return jax.lax.sort([ids, p01, p23], num_keys=1)[1]

    def sort2(ids, c0, c1, c2, c3):
        from zdr_tpu.texture import pack_bf16_pair
        return jax.lax.sort([ids, pack_bf16_pair(c0, c1)], num_keys=1)[1]

    print(f"5-op sort 1M:        {inloop(sort5, ids, *c)*1e3:.2f} ms", flush=True)
    print(f"3-op sort 1M:        {inloop(sort3, ids, *c)*1e3:.2f} ms", flush=True)
    print(f"2-op sort 1M:        {inloop(sort2, ids, *c)*1e3:.2f} ms", flush=True)

    from zdr_tpu.texture import segment_scatter_add4

    def flush_cur(ids, c0, c1, c2, c3):
        return segment_scatter_add4(ids, [c0, c1, c2, c3], NBINS, packed=True)[0]

    def flush_unpacked(ids, c0, c1, c2, c3):
        return segment_scatter_add4(ids, [c0, c1, c2, c3], NBINS, packed=False)[0]

    print(f"segment_scatter_add4 packed:   {inloop(flush_cur, ids, *c)*1e3:.2f} ms", flush=True)
    print(f"segment_scatter_add4 unpacked: {inloop(flush_unpacked, ids, *c)*1e3:.2f} ms", flush=True)

    # realistic flush ids: ~40% real entries, sentinel elsewhere
    mask = rs.rand(M) < 0.4
    real_ids = rs.randint(0, NBINS, size=M)
    ids_r = jnp.asarray(np.where(mask, real_ids, NBINS).astype(np.int32))
    print(f"flush (40% real):    {inloop(flush_cur, ids_r, *c)*1e3:.2f} ms", flush=True)

    # --- sub-step breakdown of segment_scatter_add4 (prefixes of the
    # pipeline; consecutive differences localize the milliseconds) ---
    def stepA(ids, c0, c1, c2, c3):  # sortA only
        i2, s0, s1, s2, s3 = jax.lax.sort([ids, c0, c1, c2, c3], num_keys=1)
        return s0

    def stepB(ids, c0, c1, c2, c3):  # + cumsum
        i2, s0, s1, s2, s3 = jax.lax.sort([ids, c0, c1, c2, c3], num_keys=1)
        csum = jnp.cumsum(jnp.stack([s0, s1, s2, s3], axis=0), axis=1)
        return csum[0]

    def stepC(ids, c0, c1, c2, c3):  # + sortB
        i2, s0, s1, s2, s3 = jax.lax.sort([ids, c0, c1, c2, c3], num_keys=1)
        csum = jnp.cumsum(jnp.stack([s0, s1, s2, s3], axis=0), axis=1)
        is_end = jnp.concatenate([i2[:-1] != i2[1:], jnp.ones((1,), bool)])
        key_b = jnp.where(is_end, i2, NBINS)
        kb, e0, e1, e2, e3 = jax.lax.sort(
            [key_b, csum[0], csum[1], csum[2], csum[3]], num_keys=1
        )
        return e0

    def stepB2(ids, c0, c1, c2, c3):  # sortA + 4 separate cumsums
        i2, s0, s1, s2, s3 = jax.lax.sort([ids, c0, c1, c2, c3], num_keys=1)
        return jnp.cumsum(s0) + jnp.cumsum(s1)[0] + jnp.cumsum(s2)[0] + jnp.cumsum(s3)[0]

    print(f"  stepA sortA only:        {inloop(stepA, ids_r, *c)*1e3:.2f} ms", flush=True)
    print(f"  stepB +stack+cumsum:     {inloop(stepB, ids_r, *c)*1e3:.2f} ms", flush=True)
    print(f"  stepB2 4x cumsum(M,):    {inloop(stepB2, ids_r, *c)*1e3:.2f} ms", flush=True)
    print(f"  stepC +sortB:            {inloop(stepC, ids_r, *c)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
