"""Full-image render throughput benchmark (the 800x800 FPS north-star row).

Measures frames/sec of the tiled jitted renderer on a trained-or-random
field at a given resolution, single-chip and (if >1 device) mesh-sharded.

Usage: python scripts/bench_render.py [--res 800] [--i_embed 1|3]
       [--n_samples 64] [--n_importance 128] [--frames 10]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--i_embed", type=int, default=1)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--n_importance", type=int, default=128)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--tile_rays", type=int, default=None,
                    help="default 16384 (exact) / 2048 (block: wide-row "
                         "fetches are ~1KB per point-level, so big tiles "
                         "OOM HBM)")
    ap.add_argument("--baked", action="store_true",
                    help="bench the baked deferred-shading renderer "
                         "(render/baked.py) instead of the online field")
    ap.add_argument("--baked_res", type=int, default=256,
                    help="baked grid resolution (voxels per edge)")
    ap.add_argument("--baked_geo_res", type=int, default=0,
                    help="pass-2 geo table resolution (0 = baked_res)")
    ap.add_argument("--baked_dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8"],
                    help="snapshot table dtype (int8 = log-sigma + "
                         "per-feature geo scales)")
    ap.add_argument("--guided", type=int, default=0,
                    help="with --baked: depth-guided two-level rendering; "
                         "value = coarse downsample factor (e.g. 4). "
                         "n_samples then counts FINE samples (use 16-32; quality knee 16)")
    ap.add_argument("--n_coarse", type=int, default=128,
                    help="with --guided: samples/ray of the low-res pass")
    ap.add_argument("--k_geo", type=int, default=4,
                    help="with --baked: pass-2 top-k geo fetches per ray "
                         "(quality flat to k=4, BENCH_NOTES.md; the default)")
    ap.add_argument("--pose_block", type=int, default=1,
                    help="poses rendered per device dispatch (amortizes "
                         "fixed per-dispatch latency; VERDICT round-1 "
                         "item 6)")
    ap.add_argument("--compare_single", action="store_true",
                    help="ALSO measure pose_block=1 in the same process "
                         "(same bake / same tunnel conditions) and print "
                         "a second JSON line")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend
    if args.tile_rays is None:
        args.tile_rays = (4096 if args.baked
                          else 16384 if args.i_embed == 1 else 2048)

    import jax
    import numpy as np

    from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.encoding import HashGridConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig, make_image_renderer

    bb = ((-4.0, -4.0, -4.0), (4.0, 4.0, 4.0))
    grid = block_grid = None
    if args.i_embed == 1:
        grid = HashGridConfig(bbox_min=bb[0], bbox_max=bb[1], n_levels=16,
                              log2_hashmap_size=19, base_resolution=16,
                              finest_resolution=512)
    else:
        block_grid = BlockHashConfig(bbox_min=bb[0], bbox_max=bb[1],
                                     n_levels=16, log2_rows=12,
                                     base_resolution=16, finest_resolution=512)
    fc = FieldConfig(grid=grid, block_grid=block_grid, i_embed=args.i_embed,
                     n_importance=args.n_importance)
    rc = RenderConfig(field=fc, n_samples=args.n_samples,
                      n_importance=args.n_importance, white_bkgd=True)
    params = init_field_params(jax.random.PRNGKey(0), fc)

    H = W = args.res
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 4.0
    B = max(1, args.pose_block)
    # B distinct nearby poses (a real camera path segment, not B copies).
    c2ws = np.stack([c2w.copy() for _ in range(B)])
    for b in range(B):
        c2ws[b, 0, 3] += 0.02 * b
        c2ws[b, 1, 3] -= 0.01 * b

    if args.baked:
        import time as _t

        from indoor_nerf_tpu.render.baked import (
            bake_field,
            make_baked_image_renderer,
        )

        tb = _t.perf_counter()
        baked = bake_field(params, fc, resolution=args.baked_res,
                           table_dtype=args.baked_dtype,
                           geo_resolution=args.baked_geo_res)
        float(baked["voxel_geo"].astype("float32").sum())
        bake_s = _t.perf_counter() - tb
        render = make_baked_image_renderer(
            baked, H, W, tile_rays=args.tile_rays, n_samples=args.n_samples,
            guided=args.guided, n_coarse=args.n_coarse, pose_block=B,
            k_geo=args.k_geo,
        )
        render_call = (lambda: render(c2ws, K, 2.0, 6.0)) if B > 1 else (
            lambda: render(c2w, K, 2.0, 6.0))
        single_call = lambda: render(c2w, K, 2.0, 6.0)
        cfg_out = {"baked_res": args.baked_res, "dtype": args.baked_dtype,
                   "baked_geo_res": args.baked_geo_res,
                   "n_samples": args.n_samples, "guided": args.guided,
                   "k_geo": args.k_geo,
                   "n_coarse": args.n_coarse if args.guided else None,
                   "pose_block": B,
                   "bake_seconds": round(bake_s, 2)}
    else:
        if B > 1:
            from indoor_nerf_tpu.render.renderer import (
                make_pose_block_renderer,
            )

            render = make_pose_block_renderer(rc, H, W, B, args.tile_rays)
            render_call = lambda: render(params, c2ws, K, 2.0, 6.0)
        else:
            render = make_image_renderer(rc, H, W, args.tile_rays)
            render_call = lambda: render(params, c2w, K, 2.0, 6.0)
        single = make_image_renderer(rc, H, W, args.tile_rays)
        single_call = lambda: single(params, c2w, K, 2.0, 6.0)
        cfg_out = {"i_embed": args.i_embed, "n_samples": args.n_samples,
                   "n_importance": args.n_importance}

    # Close timing with a real value reduction+transfer: block_until_ready
    # can return early over the axon tunnel (see CLAUDE.md).
    out = render_call()  # compile
    float(out["rgb_map"].sum())

    n_calls = max(1, args.frames // B)
    t0 = time.perf_counter()
    s = 0.0
    for i in range(n_calls):
        out = render_call()
        s += float(out["rgb_map"].sum())
    dt = time.perf_counter() - t0

    fps = n_calls * B / dt
    tag = "baked_" if args.baked else ""
    print(json.dumps({
        "metric": f"{tag}render_fps_{args.res}x{args.res}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "config": cfg_out,
        "seconds_per_frame": round(dt / (n_calls * B), 3),
    }))

    if args.compare_single and B > 1:
        out = single_call()
        float(out["rgb_map"].sum())
        t0 = time.perf_counter()
        s = 0.0
        for i in range(args.frames):
            out = single_call()
            s += float(out["rgb_map"].sum())
        dt1 = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"{tag}render_fps_{args.res}x{args.res}",
            "value": round(args.frames / dt1, 3),
            "unit": "frames/s",
            "config": {**cfg_out, "pose_block": 1},
            "seconds_per_frame": round(dt1 / args.frames, 3),
        }))


if __name__ == "__main__":
    main()
