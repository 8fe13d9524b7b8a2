"""Probe: can the sampler draw stack (u32 mul/xor/shift, bn-cache selects)
run INSIDE a Mosaic kernel, bit-identical to the XLA glue? Feasibility gate
for the fused2 megakernel loop (round 5)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from zdr_tpu.samplers.pmj02bn import PMJ02BNSamplerP2, make_pmj02bn_sampler_xy

R, L = 8, 128


def kernel(px_r, py_r, si_r, dim_r, seed_r, spp_r, w_r, bn_r, u1_o, u2x_o, u2y_o):
    smp = PMJ02BNSamplerP2(
        px=px_r[:],
        py=py_r[:],
        sample_index=si_r[:].astype(jnp.uint32),
        dimension=dim_r[:].astype(jnp.uint32),
        seed=seed_r[:].astype(jnp.uint32),
        spp=spp_r[:].astype(jnp.uint32),
        w=w_r[:].astype(jnp.uint32),
        bn_cache=bn_r[:],
    )
    u1, smp = smp.next1()
    (ux, uy), smp = smp._next2_xy()
    u1_o[:] = u1
    u2x_o[:] = ux
    u2y_o[:] = uy


def main():
    px = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None], (R, 1))
    py = jnp.tile(jnp.arange(R, dtype=jnp.int32)[:, None], (1, L))
    smp = make_pmj02bn_sampler_xy(px, py, 7, 16, 3)
    f32 = jnp.float32
    spec = pl.BlockSpec((R, L), lambda: (0, 0), memory_space=pltpu.VMEM)
    bn_spec = pl.BlockSpec(smp.bn_cache.shape, lambda: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[spec] * 7 + [bn_spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((R, L), f32)] * 3,
    )(px, py, smp.sample_index.astype(jnp.int32),
      smp.dimension.astype(jnp.int32), smp.seed.astype(jnp.int32),
      smp.spp.astype(jnp.int32), smp.w.astype(jnp.int32), smp.bn_cache)

    u1_ref, smp2 = smp.next1()
    (ux_ref, uy_ref), _ = smp2._next2_xy()
    for got, ref, name in zip(outs, (u1_ref, ux_ref, uy_ref),
                              ("u1", "u2x", "u2y")):
        same = (np.asarray(got) == np.asarray(ref)).all()
        print(f"{name}: bitwise_equal={bool(same)} "
              f"maxdiff={np.abs(np.asarray(got)-np.asarray(ref)).max():.3e}")
        assert same


if __name__ == "__main__":
    main()
    print("OK: sampler draws lower in Mosaic, bit-identical")
