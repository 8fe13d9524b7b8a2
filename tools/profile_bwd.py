"""Dissect the PRB persistent backward cost on real TPU.

Round-1 measured: forward 0.71 s, full iteration ~7.1 s at 512^2 spp64 —
the backward body runs ~14 ms/iter vs the forward's ~2.1 ms/iter even
though both call _walk_one_bounce once. This script times variants of the
backward body to find where the extra ~12 ms goes:

  fwd        : persistent forward loop (baseline body cost)
  bwd        : full persistent PRB backward
  bwd_noflush: scatter flush disabled (cond always false)
  bwd_novjp  : shading vjp replaced by zeros (still walks + flushes)
  bwd_nobuf  : splat buffer writes disabled

Usage: python tools/profile_bwd.py [res] [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, *args, iters=2):
    out = fn(*args)
    sync(out)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>14s}: {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    from zdr_tpu import Camera, Scene, float3
    from zdr_tpu.integrators.wrapper import _pixel_grid
    from zdr_tpu.integrators import path_persistent as pp
    from zdr_tpu.geometry.procedural import make_cornell_box, make_cornell_light

    scene = Scene(
        [(make_cornell_box(), None, None), (make_cornell_light(), None, 15.0)],
        integrator="path",
        accel="pallas",
    )
    scene.camera = Camera(
        fov=50 / 180 * 3.1415926,
        origin=float3(-0.2, 2.6, -0.5),
        target=float3(-0.2, 2.6, -5.0),
    )
    material = jnp.full((1024, 1024, 4), 0.5, jnp.float32)
    cfg = scene._config((RES, RES), SPP)
    coords = _pixel_grid(cfg.res)
    data = scene._data
    cam = scene.camera
    seed = jnp.asarray(0, jnp.int32)
    le_grad = jnp.ones((RES * RES, 3), jnp.float32) / SPP

    fwd = jax.jit(
        lambda m, s: pp.render_path_persistent(data, m, cam, s, cfg, coords)
    )
    bwd = jax.jit(
        lambda m, s: pp.render_path_backward_persistent(
            data, m, cam, s, cfg, coords, le_grad
        )
    )
    t_fwd = timeit("fwd", fwd, material, seed)
    t_bwd = timeit("bwd", bwd, material, seed)
    print(f"   bwd/fwd ratio: {t_bwd/t_fwd:.2f}")

    # ---- variant backward: toggleable pieces
    def bwd_variant(material, seed, do_vjp=True, do_buf=True, do_flush=True,
                    do_phase1=True):
        import jax.numpy as jnp
        from zdr_tpu.integrators.path import SPECULAR, _apply_rr, _walk_one_bounce, max_depth
        from zdr_tpu.microfacet import ggx_brdf
        from zdr_tpu.samplers.hashes import lcg_to_unit_float
        from zdr_tpu.texture import cm_to_texture, segment_scatter_add, stochastic_corner_ids

        win_start, win_count = 0, cfg.window_count
        n_pix = coords.shape[0]
        spp = cfg.spp
        stop_idx = jnp.full((n_pix,), win_start + win_count, jnp.int32)
        start_idx = jnp.full((n_pix,), win_start, jnp.int32)
        sgd = jax.lax.stop_gradient
        mat_s = sgd(material)
        N = n_pix
        SB = pp.SCATTER_BATCH

        sampler0, o0, d0 = pp._start_sample(
            coords, cam, seed, spp, start_idx, cfg.res, cfg.use_tent_filter,
            cfg.sampler,
        )
        init = dict(
            sample_idx=start_idx, phase=jnp.zeros((N,), jnp.int32),
            depth=jnp.zeros((N,), jnp.int32), o=o0, d=d0,
            beta=jnp.ones((N, 3), jnp.float32),
            pdf_prev=jnp.full((N,), 1e30, jnp.float32), smp=sampler0,
            cur=jnp.zeros((N, 3), jnp.float32),
            le_rem=jnp.zeros((N, 3), jnp.float32),
            gok=jnp.ones((N,), bool),
            d_mat=jnp.zeros((4, material.shape[0] * material.shape[1]), material.dtype),
            ids_buf=jnp.zeros((SB, N), jnp.int32),
            ch_buf=jnp.zeros((4, SB, N), jnp.float32),
            it=jnp.zeros((), jnp.int32),
        )
        n_bins = material.shape[0] * material.shape[1]

        def flush(d_mat, ids_buf, ch_buf):
            add = segment_scatter_add(
                ids_buf.reshape(-1), [ch_buf[c].reshape(-1) for c in range(4)],
                n_bins, channel_major=True,
            )
            return d_mat + add

        base = win_count
        max_iters = (2 if do_phase1 else 1) * (base + 1) * max_depth

        def cond(s):
            return jnp.any(s["sample_idx"] < stop_idx) & (s["it"] < max_iters)

        def body(s):
            lane_live = s["sample_idx"] < stop_idx
            in_grad = lane_live & (s["phase"] == 1)
            beta = s["beta"]
            v, smp = _walk_one_bounce(
                data, mat_s, s["o"], s["d"], s["pdf_prev"], lane_live, s["smp"]
            )
            cur = s["cur"] + jnp.where((s["phase"] == 0)[..., None], beta * v.add_emit, 0.0)
            nee_full_w = v.nee_weight[..., None] * v.nee_light_eval
            nee_contrib = beta * v.bsdf_nee * nee_full_w
            cur = cur + jnp.where(((s["phase"] == 0) & v.nee_ok)[..., None], nee_contrib, 0.0)
            le_rem = s["le_rem"] - jnp.where(in_grad[..., None], beta * v.add_emit, 0.0)
            le_rem = le_rem - jnp.where((in_grad & v.nee_ok)[..., None], nee_contrib, 0.0)

            inv_pdf = 1.0 / jnp.maximum(v.pdf_bounce, 1e-9)
            if do_vjp:
                def shade(mat4):
                    dif = mat4[..., :3]
                    rgh = mat4[..., 3]
                    b_nee = ggx_brdf(v.wo_local, v.wi_nee_local, dif, SPECULAR, rgh)
                    b_bounce = ggx_brdf(v.wo_local, v.wi_bounce_local, dif, SPECULAR, rgh)
                    return b_nee, b_bounce
                (_, _), vjpf = jax.vjp(shade, v.mat)
                gok = s["gok"]
                ct_nee = jnp.where(
                    (in_grad & v.nee_ok & gok)[..., None], beta * nee_full_w * le_grad, 0.0
                )
                ct_bounce = jnp.where(
                    (in_grad & v.active & gok)[..., None],
                    beta * inv_pdf[..., None] * le_rem * le_grad, 0.0,
                )
                (mat_grad,) = vjpf((ct_nee, ct_bounce))
                mat_grad = jnp.where(jnp.isnan(mat_grad), 0.0, mat_grad)
            else:
                mat_grad = jnp.zeros((N, 4), jnp.float32)
            grad_on = in_grad & (v.nee_ok | v.active)
            ids_buf, ch_buf = s["ids_buf"], s["ch_buf"]
            d_mat = s["d_mat"]
            if do_buf:
                u_splat = lcg_to_unit_float(smp.salt())
                ids = stochastic_corner_ids(v.uv, u_splat, material.shape[0], material.shape[1])
                slot = jnp.mod(s["it"], SB)
                ids_buf = jax.lax.dynamic_update_index_in_dim(ids_buf, ids, slot, 0)
                for c in range(4):
                    ch_buf = ch_buf.at[c, slot].set(jnp.where(grad_on, mat_grad[..., c], 0.0))
                if do_flush:
                    do_f = slot == SB - 1
                    d_mat = jax.lax.cond(
                        do_f, lambda a: flush(*a), lambda a: a[0], (d_mat, ids_buf, ch_buf)
                    )
                    ids_buf = jnp.where(do_f, jnp.zeros_like(ids_buf), ids_buf)
                    ch_buf = jnp.where(do_f, jnp.zeros_like(ch_buf), ch_buf)

            beta_next = beta * v.bsdf_bounce * inv_pdf[..., None]
            path_alive, rr = _apply_rr(s["depth"], beta_next, v.active, v.rr_scale)
            path_alive = path_alive & (s["depth"] + 1 < max_depth)
            beta_next = beta_next * rr[..., None]
            terminated = lane_live & ~path_alive
            end_le = terminated & (s["phase"] == 0)
            end_grad = terminated & (s["phase"] == (1 if do_phase1 else 0))
            le_ok = ~jnp.any(jnp.isnan(cur), axis=-1, keepdims=True)
            new_le = jnp.where(le_ok, cur, 0.0)
            sample_idx = s["sample_idx"] + end_grad.astype(jnp.int32)
            if do_phase1:
                phase = jnp.where(end_le, 1, jnp.where(end_grad, 0, s["phase"]))
            else:
                phase = s["phase"]
            new_smp, new_o, new_d = pp._start_sample(
                coords, cam, seed, spp, sample_idx, cfg.res, cfg.use_tent_filter, cfg.sampler,
            )
            restart = terminated & (sample_idx < stop_idx)
            def sel(a, b):
                r = restart.reshape(restart.shape + (1,) * (a.ndim - 1))
                return jnp.where(r, a, b)
            cont = path_alive
            o = sel(new_o, jnp.where(cont[..., None], v.next_o, s["o"]))
            d = sel(new_d, jnp.where(cont[..., None], v.next_d, s["d"]))
            smp = jax.tree.map(sel, new_smp, smp)
            cur = jnp.where(terminated[..., None], 0.0, cur)
            le_rem = jnp.where(end_le[..., None], new_le, le_rem)
            gok = jnp.where(end_le, le_ok[..., 0], s["gok"])
            beta = jnp.where(terminated[..., None], 1.0, jnp.where(cont[..., None], beta_next, beta))
            pdf_prev = jnp.where(terminated, 1e30, jnp.where(cont, v.pdf_bounce, s["pdf_prev"]))
            depth = jnp.where(terminated, 0, s["depth"] + 1)
            return dict(
                sample_idx=sample_idx, phase=phase, depth=depth, o=o, d=d,
                beta=beta, pdf_prev=pdf_prev, smp=smp, cur=cur, le_rem=le_rem,
                gok=gok, d_mat=d_mat, ids_buf=ids_buf, ch_buf=ch_buf, it=s["it"] + 1,
            )

        out = jax.lax.while_loop(cond, body, init)
        d_mat = flush(out["d_mat"], out["ids_buf"], out["ch_buf"])
        return cm_to_texture(d_mat, material.shape[0], material.shape[1])

    import functools
    for name, kw in [
        ("var_full", {}),
        ("var_noflush", dict(do_flush=False)),
        ("var_nobuf", dict(do_buf=False)),
        ("var_novjp", dict(do_vjp=False)),
        ("var_1walk", dict(do_phase1=False)),
        ("var_walkonly", dict(do_phase1=False, do_vjp=False, do_buf=False)),
    ]:
        f = jax.jit(functools.partial(bwd_variant, **kw))
        timeit(name, f, material, seed)


if __name__ == "__main__":
    main()
