"""Minimal repro hunt for the in-vjp sorted-scatter TPU worker crash.

Round-2 observation (texture.py:_read_bsdf_bwd): routing read_bsdf's
custom-vjp backward through the sorted segment pipeline
(segment_scatter_add4) kills the axon TPU worker at scale, while the same
pipeline is fine standalone and inside the PRB while_loop. Round 3: find
the minimal trigger so the bug can be root-caused or permanently contained.

Each `mode` isolates one ingredient; run one mode per process (a worker
kill takes the process with it):

  standalone   pipeline outside any vjp                       (baseline)
  vjp          pipeline inside a custom_vjp backward
  vjp-nocond   same, but k_compact=m (no lax.cond tail)
  vjp-nopack   same, packed=False (no bf16 bitcasts)
  vjp-plain    same, simple sort+ff segment_scatter_add (no compaction)
  grad-gather  jax.grad through a plain gather (XLA-transposed scatter)

Usage: python -u tools/repro_vjp_scatter.py MODE [N] [HW]
Prints OK <checksum> on survival.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

MODE = sys.argv[1] if len(sys.argv) > 1 else "vjp"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
HW = int(sys.argv[3]) if len(sys.argv) > 3 else 1024


def main():
    from zdr_tpu import texture as tex

    h = w = HW
    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(N, 2).astype(np.float32))

    def bwd_kernel(uvs, g, kind):
        """The gradient path under test: (N,4) cotangent -> (H,W,4)."""
        x0, y0, fx, fy = tex._texel_coords(uvs, h, w)
        xa, ya = tex._clamp_xy(x0, y0, h, w)
        ids = ya * w + xa
        chans = [g[:, c] for c in range(4)]
        if kind == "plain":
            cm = tex.segment_scatter_add(ids, chans, h * w, channel_major=True)
        elif kind == "nocond":
            cm = tex.segment_scatter_add4(ids, chans, h * w, k_compact=N)
        elif kind == "nopack":
            cm = tex.segment_scatter_add4(ids, chans, h * w, packed=False)
        else:
            cm = tex.segment_scatter_add4(ids, chans, h * w, packed=True)
        return tex.cm_to_texture(cm, h, w)

    if MODE == "standalone":
        g = jnp.asarray(rs.rand(N, 4).astype(np.float32))
        out = jax.jit(lambda u, gg: bwd_kernel(u, gg, "packed"))(uv, g)
        print("OK", float(out.sum()), flush=True)
        return

    if MODE == "grad-gather":
        mat = jnp.asarray(rs.rand(h, w, 4).astype(np.float32))

        def loss(m):
            return jnp.sum(m.reshape(h * w, 4)[(uv[:, 0] * (h * w - 1)).astype(jnp.int32)])

        out = jax.jit(jax.grad(loss))(mat)
        print("OK", float(out.sum()), flush=True)
        return

    kind = {
        "vjp": "packed",
        "vjp-nocond": "nocond",
        "vjp-nopack": "nopack",
        "vjp-plain": "plain",
    }[MODE]

    @jax.custom_vjp
    def fetch(uvs, m):
        flat = m.reshape(h * w, 4)
        x0, y0, _, _ = tex._texel_coords(uvs, h, w)
        xa, ya = tex._clamp_xy(x0, y0, h, w)
        return flat[ya * w + xa]

    def fwd(uvs, m):
        return fetch(uvs, m), uvs

    def bwd(res, g):
        return jnp.zeros((N, 2), jnp.float32), bwd_kernel(res, g, kind)

    fetch.defvjp(fwd, bwd)
    mat = jnp.asarray(rs.rand(h, w, 4).astype(np.float32))

    def loss(m):
        return jnp.sum(fetch(uv, m))

    step = jax.jit(jax.grad(loss))
    t0 = time.time()
    out = jax.block_until_ready(step(mat))
    s = float(out.sum())
    t_compile = time.time() - t0
    t0 = time.time()
    s2 = float(step(mat).sum())
    t_run = time.time() - t0
    print(
        f"OK {s} compile+first={t_compile:.1f}s steady={t_run*1e3:.0f}ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
