"""Same-session serving-frame attribution ladder (the 800^2 FPS push).

Render-FPS through the axon tunnel varies +-25% ACROSS sessions
(BENCH_NOTES.md measurement hygiene), so every config here is measured in
ONE process against the same bake. Arms isolate the frame's cost terms:
coarse guide pass, fine sigma march, pass-2 geo fetch, tile size.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/probe_serving.py \
    [--res 800] [--frames 8] [--out tpu_serving_ladder.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--pose_block", type=int, default=8)
    ap.add_argument("--baked_res", type=int, default=256)
    ap.add_argument("--out", default="tpu_serving_ladder.json")
    ap.add_argument("--arms", default=(
        # Round-3 ladder: geo-table resolution (gres) is the main arm —
        # the 4.3 GB corner table gathers in the slow GB-scale regime
        # (~34-50M rows/s) and shrinks 8x per halving at unchanged row
        # count. k/nf arms stack on top.
        "base:g=4,nf=16,nc=64,k=4;"
        "gres128:g=4,nf=16,nc=64,k=4,gres=128;"
        "gres64:g=4,nf=16,nc=64,k=4,gres=64;"
        "k3:g=4,nf=16,nc=64,k=3;"
        "k3gres128:g=4,nf=16,nc=64,k=3,gres=128;"
        "nf12k3gres128:g=4,nf=12,nc=64,k=3,gres=128;"
        "nf8:g=4,nf=8,nc=64,k=4;"
        "k1:g=4,nf=16,nc=64,k=1"))
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import numpy as np

    from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.render.baked import (
        bake_field,
        make_baked_image_renderer,
    )

    bb = ((-4.0, -4.0, -4.0), (4.0, 4.0, 4.0))
    block_grid = BlockHashConfig(bbox_min=bb[0], bbox_max=bb[1],
                                 n_levels=16, log2_rows=12,
                                 base_resolution=16, finest_resolution=512)
    fc = FieldConfig(block_grid=block_grid, i_embed=3, n_importance=0)
    params = init_field_params(jax.random.PRNGKey(0), fc)

    bakes = {}

    def get_bake(gres):
        if gres not in bakes:
            b = bake_field(params, fc, resolution=args.baked_res,
                           table_dtype="bfloat16", geo_resolution=gres)
            float(b["voxel_geo"].astype("float32").sum())
            bakes[gres] = b
        return bakes[gres]

    H = W = args.res
    K = np.array([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                 np.float32)
    B = args.pose_block
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    c2w[2, 3] = 4.0
    c2ws = np.stack([c2w.copy() for _ in range(B)])
    for b in range(B):
        c2ws[b, 0, 3] += 0.02 * b
        c2ws[b, 1, 3] -= 0.01 * b

    results = {}
    for spec in args.arms.split(";"):
        name, _, kvs = spec.partition(":")
        kv = dict(p.split("=") for p in kvs.split(","))
        g = int(kv.get("g", 4))
        nf = int(kv.get("nf", 16))
        nc = int(kv.get("nc", 64))
        k = int(kv.get("k", 4))
        tile = int(kv.get("tile", 16384))
        pb = int(kv.get("pb", B))
        gres = int(kv.get("gres", 0))
        cm = bool(int(kv.get("cm", 1)))  # lane-space corner matmul (pass 2)
        so = bool(int(kv.get("so", 1)))  # one-hot (gather-free) selection
        cw = c2ws[:pb] if pb <= B else np.concatenate(
            [c2ws] * (-(-pb // B)))[:pb]
        render = make_baked_image_renderer(
            get_bake(gres), H, W, tile_rays=tile, n_samples=nf,
            guided=g, n_coarse=nc, pose_block=pb, k_geo=k,
            corner_matmul=cm, select_onehot=so,
        )
        out = render(cw, K, 2.0, 6.0)  # compile
        float(out["rgb_map"].sum())
        n_calls = max(1, args.frames // pb)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            out = render(cw, K, 2.0, 6.0)
            float(out["rgb_map"].sum())
        dt = time.perf_counter() - t0
        spf = dt / (n_calls * pb)
        results[name] = {"g": g, "nf": nf, "nc": nc, "k": k, "tile": tile,
                         "gres": gres, "cm": int(cm), "so": int(so),
                         "pose_block": pb, "s_per_frame": round(spf, 4),
                         "fps": round(1.0 / spf, 2)}
        print(f"{name}: {spf*1e3:.0f} ms/frame ({1/spf:.2f} FPS)",
              flush=True)

    with open(args.out, "w") as f:
        json.dump({"res": args.res, "pose_block": B, "arms": results}, f,
                  indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
