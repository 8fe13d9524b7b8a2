"""Render-level accuracy + speed gate for the MXU Woop sweep precision.

The Woop sweep matmuls (pallas_bounce.MXU_PRECISION) only pick winners,
but secondary rays start ON the surface where o'_w cancels catastrophically
— so matmul precision shows up as shadow acne / wrong secondary hits, not
as uv noise. This renders the reference-protocol scene (direct, 962-tri
sphere + quad light) and a path-integrator sphere fused-forced at the
precision given by ZDR_MXU_PRECISION, compares against the unfused XLA
walk, and times the fused forward in-loop.

Run one precision per process (the lru-cached builders and jit caches key
on code, not on the env var):

  for p in highest high default; do
    ZDR_MXU_PRECISION=$p python -u tools/profile_mxu_accuracy.py
  done
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_quad, make_uv_sphere

    prec = os.environ.get("ZDR_MXU_PRECISION", "comp")
    res = (256, 256)
    spp = 16
    mat = jnp.full((256, 256, 4), 0.5, jnp.float32)

    for integ in ("direct", "path"):
        scene = Scene(
            [
                (make_uv_sphere(0.5, 16, 32), None, None),
                (make_quad(size=1.0, y=-2.0), None, 40.0),
            ],
            integrator=integ,
        )
        scene.camera = Camera(
            fov=0.8, origin=float3(1.5, 0.3, 0.0), target=float3(0.0, 0.0, 0.0)
        )
        scene.fused = "off"
        ref = np.asarray(scene.render(mat, res=res, spp=spp, seed=7))
        scene.fused = "force"
        img = np.asarray(scene.render(mat, res=res, spp=spp, seed=7))
        d = np.abs(img[..., :3] - ref[..., :3])
        # timing: repeated fused forward (fresh seeds avoid constant folding)
        t0 = time.time()
        reps = 4
        for i in range(reps):
            float(scene.render(mat, res=res, spp=spp, seed=100 + i).sum())
        dt = (time.time() - t0) / reps
        print(
            f"prec={prec:8s} integ={integ:6s} maxdiff={d.max():.3e} "
            f"meandiff={d.mean():.3e} fused_fwd={dt*1e3:.1f} ms "
            f"({res[0]}x{res[1]}x{spp}spp)",
            flush=True,
        )


if __name__ == "__main__":
    main()
