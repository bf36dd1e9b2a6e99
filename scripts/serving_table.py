"""The serving deliverable table: held-out PSNR AND 800^2 FPS per arm,
measured in ONE session against the same trained field.

VERDICT round-3 item 1: the FPS ladder (tpu_serving_ladder_r3b.json) and
the quality sweep (baked_quality_kgeo.json) were measured on DIFFERENT
configs in different sessions, so ">=10 FPS in range" stayed a hypothesis.
This script trains the flagship once, bakes float and int8 snapshots
(with visibility culling), and for every arm evaluates BOTH axes:

- quality: mean held-out test-view PSNR at the scene resolution;
- speed:   s/frame and FPS at --fps_res (default 800^2, pose_block 8).

Render-FPS through the axon tunnel varies +-25% ACROSS sessions
(BENCH_NOTES.md measurement hygiene) — this is why both columns and all
arms must come from one process.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/serving_table.py \
    [--iters 1200] [--out serving_table.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--n_rand", type=int, default=4096)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--baked_res", type=int, default=256)
    ap.add_argument("--fps_res", type=int, default=800)
    ap.add_argument("--fps_frames", type=int, default=8)
    ap.add_argument("--pose_block", type=int, default=8)
    ap.add_argument("--guided", type=int, default=4)
    ap.add_argument("--skip_quality", action="store_true",
                    help="FPS-only ladder (same arms, no PSNR column)")
    ap.add_argument("--arms", default=(
        # nf = guided fine samples, nc = coarse samples, k = pass-2 top-k,
        # dt = bake table dtype. 'base' is the shipped default.
        "base:nf=16,nc=64,k=4;"
        "base_tg:nf=16,nc=64,k=4,so=0;"  # A/B: width-1-gather selection
        "k3:nf=16,nc=64,k=3;"
        "k2:nf=16,nc=64,k=2;"
        "k1:nf=16,nc=64,k=1;"
        "nf12k2:nf=12,nc=64,k=2;"
        "int8:nf=16,nc=64,k=4,dt=int8;"
        "int8k2:nf=16,nc=64,k=2,dt=int8;"
        "int8nf12k2:nf=12,nc=64,k=2,dt=int8"))
    ap.add_argument("--out", default="serving_table.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from indoor_nerf_tpu.data.pipeline import BatchedRaySampler
    from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
    from indoor_nerf_tpu.models.field import FieldConfig
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.baked import (
        bake_field,
        make_baked_image_renderer,
    )
    from indoor_nerf_tpu.render.renderer import (
        RenderConfig,
        make_image_renderer,
    )
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    # Same trained-scene protocol as scripts/eval_baked_quality.py (so the
    # PSNR column is comparable with baked_quality_kgeo.json).
    scene = make_synthetic_scene(n_views=args.views, H=args.res, W=args.res)
    bg = BlockHashConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        n_levels=16, log2_rows=13, base_resolution=16,
        finest_resolution=512, block_size=3,
        gather_dtype="bfloat16", scatter_dtype="bfloat16",
    )
    occ = OccupancyConfig(
        bbox_min=scene["bbox_min"], bbox_max=scene["bbox_max"],
        resolution=64, warmup_steps=8, weighting="transmittance",
    )
    fc = FieldConfig(block_grid=bg, i_embed=3, n_importance=0)
    rc = RenderConfig(field=fc, n_samples=64, n_importance=0,
                      white_bkgd=True, occupancy=occ, n_occ_samples=32)
    cfg = TrainConfig(render=rc, near=scene["near"], far=scene["far"],
                      n_rand=args.n_rand, lrate=0.01, tv_loss_weight=0.0)

    H, W, _ = scene["hwf"]
    sampler = BatchedRaySampler(
        scene["images"], scene["poses"], scene["i_split"][0],
        H, W, scene["K"], cfg.n_rand,
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = jax.jit(functools.partial(train_step, config=cfg))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in sampler.next().items()}
        state, metrics = step_fn(state, batch, sub)
    train_psnr = float(metrics["psnr"])  # closes the timing window too
    print(f"trained {args.iters} iters in {time.perf_counter()-t0:.1f}s, "
          f"train PSNR {train_psnr:.2f}", flush=True)

    train_cams = {
        "poses": scene["poses"][scene["i_split"][0]],
        "K": scene["K"], "H": H, "W": W,
        "near": scene["near"], "far": scene["far"],
    }
    bakes = {}

    def get_bake(dt, gres=0, cp=100.0, se="sqrt"):
        # Normalize the key: se only matters when the dtype quantizes
        # sigma, cp only when it quantizes geo — otherwise identical bakes
        # would re-run (evict-all policy makes that a full expensive
        # re-bake per arm).
        key = (dt, gres,
               cp if dt in ("int8", "int8geo") else 100.0,
               se if dt in ("int8", "int8sig") else "sqrt")
        if key not in bakes:
            # Evict other bakes first: two resident 256^3 bakes exceed the
            # chip's 16 GB HBM (a bf16 bake is ~4.4 GB; the int8 bake
            # stages bf16 tables before quantizing). Group same-bake arms
            # adjacently in --arms to avoid re-bakes.
            for k in list(bakes):
                del bakes[k]
            b = bake_field(state["params"], fc, resolution=args.baked_res,
                           table_dtype=dt, train_cameras=train_cams,
                           geo_resolution=gres, int8_clip_pct=cp,
                           sigma_enc=se)
            float(b["voxel_geo"].astype("float32").sum())
            bakes[key] = b
        return bakes[key]

    def psnr(rgb, gt):
        return float(-10 * np.log10(np.mean((np.asarray(rgb) - gt) ** 2)))

    results = {}

    # FPS pose block at fps_res (camera geometry as in probe_serving.py).
    Hf = Wf = args.fps_res
    Kf = np.array([[0.9 * Wf, 0, Wf / 2], [0, 0.9 * Wf, Hf / 2], [0, 0, 1]],
                  np.float32)
    B = args.pose_block
    c2w0 = np.asarray(scene["poses"][scene["i_split"][2][0]])[:3, :4]
    c2ws = np.stack([c2w0.copy() for _ in range(B)])
    for b in range(B):
        c2ws[b, 0, 3] += 0.02 * b
        c2ws[b, 1, 3] -= 0.01 * b

    # TRUE-GT quality at the SERVED resolution (VERDICT round-4 weak #7:
    # "10.45 FPS at 23.92 dB" mixed 128^2 quality with 800^2 speed). The
    # synthetic scene is analytic, so test view 0 regenerates exactly at
    # fps_res (Kf keeps the scene's 0.9*W relative focal); frame 0 of the
    # FPS pose block IS that pose, so each arm's hires PSNR column reuses
    # the block already rendered for timing — zero extra renders.
    gt_hires = None
    if not args.skip_quality:
        from indoor_nerf_tpu.data.synthetic import _render_analytic
        from indoor_nerf_tpu.ops.rays import get_rays_np

        ro, rd = get_rays_np(Hf, Wf, Kf, c2w0)
        gt_hires = _render_analytic(
            ro.reshape(-1, 3), rd.reshape(-1, 3)).reshape(Hf, Wf, 3)

    # Online reference quality (the ceiling the bake approximates).
    if not args.skip_quality:
        online = make_image_renderer(rc.test_mode(), H, W, 4096)
        vals = []
        for i_test in scene["i_split"][2]:
            gt = np.asarray(scene["images"][i_test])
            c2w = np.asarray(scene["poses"][i_test])[:3, :4]
            o = online(state["params"], c2w, scene["K"], scene["near"],
                       scene["far"])
            vals.append(psnr(o["rgb_map"], gt))
        results["online"] = {"test_psnr_db": round(float(np.mean(vals)), 2)}
        print(f"online: {results['online']['test_psnr_db']:.2f} dB",
              flush=True)
        # Online ceiling at the SERVED resolution (same pose as the
        # per-arm hires column; one slow ~10 s render, done once).
        online_f = make_image_renderer(rc.test_mode(), Hf, Wf, 16384)
        of = online_f(state["params"], c2w0, Kf, scene["near"],
                      scene["far"])
        results["online"]["hires_psnr_db"] = round(
            psnr(of["rgb_map"], gt_hires), 2)
        print(f"online hires ({Hf}^2): "
              f"{results['online']['hires_psnr_db']:.2f} dB", flush=True)
        del online_f, of

    for spec in args.arms.split(";"):
        name, _, kvs = spec.partition(":")
        kv = dict(p.split("=") for p in kvs.split(","))
        nf = int(kv.get("nf", 16))
        nc = int(kv.get("nc", 64))
        k = int(kv.get("k", 4))
        dt = kv.get("dt", "bfloat16")
        so = bool(int(kv.get("so", 1)))  # one-hot (gather-free) selection
        gres = int(kv.get("gres", 0))  # coarser pass-2 geo table grid
        cp = float(kv.get("cp", 100.0))  # int8 geo-scale clip percentile
        rn = bool(int(kv.get("rn", 1)))  # top-k weight renormalization
        se = kv.get("se", "sqrt")  # int8 sigma encoding space
        # Drop the previous arm's renderer closures BEFORE baking: they
        # pin the old bake's tables, and two resident 256^3 bakes exceed
        # the chip's HBM.
        baked = qrender = frender = out = None
        baked = get_bake(dt, gres, cp, se)
        row = {"nf": nf, "nc": nc, "k": k, "dtype": dt, "so": int(so),
               "gres": gres, "cp": cp, "rn": int(rn), "se": se}

        if not args.skip_quality:
            qrender = make_baked_image_renderer(
                baked, H, W, tile_rays=4096, n_samples=nf,
                guided=args.guided, n_coarse=nc, k_geo=k, select_onehot=so,
                renorm_k=rn)
            vals = []
            for i_test in scene["i_split"][2]:
                gt = np.asarray(scene["images"][i_test])
                c2w = np.asarray(scene["poses"][i_test])[:3, :4]
                g = qrender(c2w, scene["K"], scene["near"], scene["far"])
                vals.append(psnr(g["rgb_map"], gt))
            row["test_psnr_db"] = round(float(np.mean(vals)), 2)

        frender = make_baked_image_renderer(
            baked, Hf, Wf, tile_rays=16384, n_samples=nf,
            guided=args.guided, n_coarse=nc, k_geo=k, pose_block=B,
            select_onehot=so, renorm_k=rn)
        out = frender(c2ws, Kf, scene["near"], scene["far"])  # compile
        float(out["rgb_map"].sum())
        n_calls = max(1, args.fps_frames // B)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            out = frender(c2ws, Kf, scene["near"], scene["far"])
            float(out["rgb_map"].sum())
        spf = (time.perf_counter() - t0) / (n_calls * B)
        row["s_per_frame"] = round(spf, 4)
        row["fps"] = round(1.0 / spf, 2)
        if gt_hires is not None:
            # Frame 0 of the timed block is test pose 0 at fps_res.
            row["hires_psnr_db"] = round(
                psnr(np.asarray(out["rgb_map"])[0], gt_hires), 2)
        results[name] = row
        q = row.get("test_psnr_db")
        print(f"{name}: {row['fps']:.2f} FPS"
              + (f", {q:.2f} dB" if q is not None else ""), flush=True)

    payload = {
        "config": {"iters": args.iters, "baked_res": args.baked_res,
                   "res": args.res, "fps_res": args.fps_res,
                   "pose_block": B, "guided": args.guided},
        "train_psnr_db": round(train_psnr, 2),
        "arms": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
