"""XLA row-gather cost model on TPU (round 5).

The fused path bounce's dominant cost is ONE 262k-row gather from the
quad-packed (1M, 16) f32 texture table (~1.37 ms = ~5 ns/row). This tool
maps the cost vs row width, lane count, table size, index coherence and
dtype, to decide whether a faster fetch exists (reps-in-jit timing).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
REPS = 30


def timeit_l(name, body, *args, reps=REPS):
    def outer(*a):
        def step(i, acc):
            out = body(acc * 1e-30, *a)
            return acc + out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, step, jnp.float32(0.0))

    f = jax.jit(outer)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0 - 0.03) / reps
    print(f"{name:>38s}: {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    N = 262144
    T = 1023 * 1023

    idx_rand = jnp.asarray(rng.randint(0, T, size=N), jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    # coherent: blocks of 512 lanes share a small neighborhood (Morton-ish)
    base = rng.randint(0, T - 512, size=N // 512)
    idx_coh = jnp.asarray(
        (base[:, None] + rng.randint(0, 400, size=(N // 512, 512))).reshape(-1),
        jnp.int32,
    )

    for width in (16, 8, 4, 2, 1):
        tab = jnp.asarray(rng.rand(T, width), jnp.float32)
        timeit_l(f"rows w={width:2d} rand", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], tab, idx_rand)

    tab16 = jnp.asarray(rng.rand(T, 16), jnp.float32)
    timeit_l("rows w=16 sorted", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], tab16, idx_sort)
    timeit_l("rows w=16 coherent", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], tab16, idx_coh)
    timeit_l(
        "rows w=16 sorted flag",
        lambda p, t, i: jax.lax.gather(
            t,
            (i + jnp.int32(p != 0.0))[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            (1, 16),
            indices_are_sorted=True,
            unique_indices=False,
        )
        + p,
        tab16,
        idx_sort,
    )

    # lane-count scaling
    for n in (65536, 131072, 524288):
        timeit_l(f"rows w=16 rand N={n}", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], tab16,
                 idx_rand[:n] if n <= N else jnp.tile(idx_rand, 2)[:n])

    # table-size scaling (locality)
    for tt in (4096, 65536, 1048576):
        tabs = jnp.asarray(rng.rand(tt, 16), jnp.float32)
        ii = jnp.asarray(rng.randint(0, tt, size=N), jnp.int32)
        timeit_l(f"rows w=16 T={tt}", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], tabs, ii)

    # dtype variants
    tab_bf = tab16.astype(jnp.bfloat16)
    timeit_l("rows w=16 bf16", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)].astype(jnp.float32),
             tab_bf, idx_rand)
    # bf16 pairs bitcast-packed into f32: (T, 8) f32 rows carrying 16 values
    tab_pack = jax.lax.bitcast_convert_type(
        tab_bf.reshape(T, 8, 2), jnp.float32
    )
    timeit_l("rows w=8 f32(=16 bf16 packed)", lambda p, t, i: t[jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 1)],
             tab_pack, idx_rand)

    # gather expressed as take_along_axis on flat f32 (scalar gather x16?)
    flat = tab16.reshape(-1)
    timeit_l("flat scalar gather x1", lambda p, t, i: t[jnp.clip(i * 16 + jnp.int32(p != 0.0), 0, t.shape[0] - 1)], flat,
             idx_rand)

    # 4 separate w=4 gathers (the pre-quad-packing formulation)
    tab4 = jnp.asarray(rng.rand(T, 4), jnp.float32)
    timeit_l(
        "4x rows w=4 rand",
        lambda p, t, i: (lambda j: t[j] + t[j + 1] + t[j + 7] + t[j + 9])(jnp.clip(i + jnp.int32(p != 0.0), 0, t.shape[0] - 10)),
        tab4,
        jnp.clip(idx_rand, 0, T - 10),
    )


if __name__ == "__main__":
    main()
