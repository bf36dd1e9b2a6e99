"""Ablation timing of the flagship train step: where do the milliseconds go?

Times each constituent of the block+occupancy train step (the bench.py
configuration) as its own scanned compiled program on the real chip, so the
sum of parts can be compared against the whole. All timing windows are
closed with an actual value transfer (float(...)) per the axon-tunnel rule
(CLAUDE.md): jax.block_until_ready can return early through the tunnel.

Usage: PYTHONPATH=. python scripts/ablate_step.py [--steps 20]
Writes tpu_ablate_step.json.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", type=str, default="tpu_ablate_step.json")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 gather + fused bfloat16 scatter backward")
    ap.add_argument("--int8", action="store_true",
                    help="int8 gather (per-level STE quant) + fused "
                         "bfloat16 scatter backward")
    ap.add_argument("--gather_bf16", action="store_true",
                    help="bfloat16 gather only (f32 autodiff backward)")
    ap.add_argument("--probe_bwd", action="store_true",
                    help="ONLY run the fused-backward internal probes "
                         "(cotangent formation vs scatter attribution). "
                         "CAUTION: scatter microprobes have wedged the "
                         "axon chip before; these reuse the training "
                         "step's exact shapes/index distribution")
    ap.add_argument("--block_size", type=int, default=4, choices=[4, 3])
    ap.add_argument("--n_levels", type=int, default=16,
                    help="table levels (the round-3 flagship is 8x4: "
                         "--n_levels 8 --n_features 4 at log2_rows 13)")
    ap.add_argument("--n_features", type=int, default=2,
                    help="features per level")
    ap.add_argument("--log2_rows", type=int, default=None,
                    help="rows/level = 2^k (default: 12 for block_size 4, "
                         "13 for 3)")
    ap.add_argument("--occ_weighting", default="density",
                    choices=["density", "transmittance"])
    ap.add_argument("--occ_samples", type=int, default=None,
                    help="occupancy-guided samples per ray (default: "
                         "n_samples=64; the shipped flagship preset is 48)")
    ap.add_argument("--mlp_bf16", action="store_true",
                    help="bfloat16 MLP activation precision")
    ap.add_argument("--ray_strides", type=str, default=None,
                    help="per-level ray-axis strides, comma list "
                         "(e.g. 4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1)")
    ap.add_argument("--ray_groups", type=str, default=None,
                    help="per-level sample-group sizes, comma list "
                         "(e.g. 4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1) — "
                         "shared-tile exact grouping (blockhash.py)")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of timing names to run (e.g. "
                         "full_train_step) — each compile through the "
                         "axon tunnel is minutes, so sweeps should time "
                         "one program per process")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.models.field import FieldConfig, init_field_params
    from indoor_nerf_tpu.ops.blockhash import (
        BlockHashConfig,
        block_hash_encode,
    )
    from indoor_nerf_tpu.ops.occupancy import OccupancyConfig
    from indoor_nerf_tpu.render.renderer import RenderConfig, render_rays
    from indoor_nerf_tpu.train.optim import (
        init_radam_state,
        pocketnerf_hyper_fn,
        radam_update,
    )
    from indoor_nerf_tpu.train.step import (
        TrainConfig,
        init_train_state,
        train_step,
    )

    n_rand = 4096
    n_samples = 64
    bbox = 1.5
    bb = ((-bbox,) * 3, (bbox,) * 3)
    io = {}
    if args.int8:
        io = dict(gather_dtype="int8", scatter_dtype="bfloat16")
    elif args.bf16:
        io = dict(gather_dtype="bfloat16", scatter_dtype="bfloat16")
    elif args.gather_bf16:
        io = dict(gather_dtype="bfloat16")
    block_grid = BlockHashConfig(
        bbox_min=bb[0], bbox_max=bb[1], n_levels=args.n_levels,
        n_features_per_level=args.n_features,
        log2_rows=(args.log2_rows if args.log2_rows is not None
                   else (12 if args.block_size == 4 else 13)),
        base_resolution=16, finest_resolution=512,
        block_size=args.block_size,
        ray_strides=(tuple(int(v) for v in args.ray_strides.split(","))
                     if args.ray_strides else None),
        ray_groups=(tuple(int(v) for v in args.ray_groups.split(","))
                    if args.ray_groups else None),
        **io,
    )
    occupancy = OccupancyConfig(
        bbox_min=bb[0], bbox_max=bb[1], resolution=64, warmup_steps=8,
        weighting=args.occ_weighting,
    )
    fc = FieldConfig(block_grid=block_grid, i_embed=3, n_importance=0,
                     compute_dtype="bfloat16" if args.mlp_bf16 else "float32")
    n_occ = args.occ_samples if args.occ_samples else n_samples
    rc = RenderConfig(field=fc, n_samples=n_samples, n_importance=0,
                      white_bkgd=True, occupancy=occupancy,
                      n_occ_samples=n_occ)
    cfg = TrainConfig(render=rc, near=2.0, far=6.0, n_rand=n_rand)

    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rand, 3))
    o = 4.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    aim = rng.uniform(-bbox, bbox, size=(n_rand, 3))
    dirs = aim - o
    batch = {
        "rays_o": jnp.asarray(o, jnp.float32),
        "rays_d": jnp.asarray(
            dirs / np.linalg.norm(dirs, axis=-1, keepdims=True), jnp.float32
        ),
        "target": jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32),
    }
    viewdirs = batch["rays_d"]
    near = cfg.near * jnp.ones((n_rand, 1))
    far = cfg.far * jnp.ones((n_rand, 1))

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    n_steps = args.steps
    results = {}

    only = set(args.only.split(",")) if args.only else None

    def timed(name, make_program, *operands):
        """make_program(*operands) -> scalar-returning jitted fn; scan-looped."""
        if only is not None and name not in only:
            return
        fn = make_program(*operands)
        out = fn(*operands)
        float(out)  # compile + drain
        t0 = time.perf_counter()
        out = fn(*operands)
        float(out)
        dt = (time.perf_counter() - t0) / n_steps * 1000.0
        results[name] = round(dt, 2)
        print(f"{name:34s} {dt:8.2f} ms")

    if args.probe_bwd:
        # Fused-backward internals at the step's exact shapes: where do the
        # encode-backward milliseconds go — cotangent math, the bf16
        # scatter, or their composition?
        from indoor_nerf_tpu.ops.blockhash import _tile_coords

        n_pts = n_rand * n_occ
        pts = jnp.asarray(
            rng.uniform(-bbox, bbox, size=(n_pts, 3)), jnp.float32)
        flat_row, pcoord, _ = _tile_coords(pts, block_grid)
        Fb = block_grid.n_features_per_level
        lpf = block_grid.lanes_per_feature
        sideb = block_grid.side
        gshape = (block_grid.n_levels * block_grid.rows_per_level, Fb * lpf)
        gcot = jnp.asarray(
            rng.normal(size=(flat_row.shape[0], Fb)), jnp.float32)

        def cot_expr(pc, g, dt):
            m = g.shape[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, (m, Fb * lpf), 1)
            v = lane % lpf
            lx = (v // (sideb * sideb)).astype(jnp.float32)
            ly = ((v // sideb) % sideb).astype(jnp.float32)
            lz = (v % sideb).astype(jnp.float32)
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(lx - pc[:, 0:1]))
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(ly - pc[:, 1:2]))
            tz = jnp.maximum(0.0, 1.0 - jnp.abs(lz - pc[:, 2:3]))
            feat = lane // lpf
            g_sel = jnp.zeros((m, Fb * lpf), jnp.float32)
            for f in range(Fb):
                g_sel = jnp.where(feat == f, g[:, f:f + 1], g_sel)
            return (g_sel * tx * ty * tz).astype(dt)

        def make_cot_only(pcoord, gcot):
            @jax.jit
            def run(pcoord, gcot):
                def body(carry, _):
                    acc, g = carry
                    s = jnp.sum(
                        cot_expr(pcoord, g, jnp.bfloat16)
                        .astype(jnp.float32))
                    return (acc + s, g + 1e-20 * s), None
                (acc, _), _ = jax.lax.scan(
                    body, (jnp.zeros(()), gcot), None, length=n_steps)
                return acc
            return run

        timed("cot_formation_reduce_only", make_cot_only, pcoord, gcot)

        cot16 = jax.jit(
            lambda pc, g: cot_expr(pc, g, jnp.bfloat16))(pcoord, gcot)

        def make_scatter(dt):
            def mk(cot, idx2):
                @jax.jit
                def run(cot, idx2):
                    def body(carry, _):
                        acc, c = carry
                        gt = jnp.zeros(gshape, dt).at[idx2].add(c.astype(dt))
                        s = jnp.sum(gt.astype(jnp.float32))
                        return (acc + s,
                                c + (1e-20 * s).astype(c.dtype)), None
                    (acc, _), _ = jax.lax.scan(
                        body, (jnp.zeros(()), cot), None, length=n_steps)
                    return acc
                return run
            return mk

        timed("scatter_only_bf16", make_scatter(jnp.bfloat16),
              cot16, flat_row)
        timed("scatter_only_f32", make_scatter(jnp.float32),
              cot16.astype(jnp.float32), flat_row)

        def make_cot_scatter(pcoord, gcot, idx2):
            @jax.jit
            def run(pcoord, gcot, idx2):
                def body(carry, _):
                    acc, g = carry
                    c = cot_expr(pcoord, g, jnp.bfloat16)
                    gt = jnp.zeros(gshape, jnp.bfloat16).at[idx2].add(c)
                    s = jnp.sum(gt.astype(jnp.float32))
                    return (acc + s, g + 1e-20 * s), None
                (acc, _), _ = jax.lax.scan(
                    body, (jnp.zeros(()), gcot), None, length=n_steps)
                return acc
            return run

        timed("cot_scatter_bf16", make_cot_scatter, pcoord, gcot, flat_row)

        results["_config"] = {
            "n_rand": n_rand, "n_samples": n_samples, "n_steps": n_steps,
            "n_points": n_pts,
            "rows_scattered": int(flat_row.shape[0]),
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results))
        return

    # --- 1. full train step -------------------------------------------------
    def make_full(state, batch):
        @jax.jit
        def run(state, batch):
            def body(carry, k):
                st, _ = carry
                st, metrics = train_step(st, batch, k, cfg)
                return (st, metrics["loss"]), None
            keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
            (st, loss), _ = jax.lax.scan(body, (state, jnp.zeros(())), keys)
            return loss
        return run

    timed("full_train_step", make_full, state, batch)

    # --- 2. value_and_grad(render loss) only (no radam / occ refresh) -------
    def make_vag(state, batch):
        @jax.jit
        def run(state, batch):
            def loss_fn(params, key):
                out, _ = render_rays(
                    key, params, batch["rays_o"], batch["rays_d"], viewdirs,
                    near, far, rc, quant_state=None, train=True,
                    step=state["step"], occ_state=state["occ"],
                )
                return jnp.mean((out["rgb_map"] - batch["target"]) ** 2)

            def body(carry, k):
                acc, params = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, k)
                # feed grads back so the scan carries the work
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-9 * g, params, grads)
                return (acc + loss, params), None
            keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
            (loss, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), state["params"]), keys)
            return loss
        return run

    timed("render_loss_fwd_bwd", make_vag, state, batch)

    # --- 3. render forward only ---------------------------------------------
    def make_fwd(state, batch):
        @jax.jit
        def run(state, batch):
            def body(carry, k):
                acc, ro = carry
                out, _ = render_rays(
                    k, state["params"], ro, batch["rays_d"], viewdirs,
                    near, far, rc, quant_state=None, train=True,
                    step=state["step"], occ_state=state["occ"],
                )
                s = jnp.sum(out["rgb_map"])
                return (acc + s, ro + 1e-20 * s), None
            keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), batch["rays_o"]), keys)
            return acc
        return run

    timed("render_fwd_only", make_fwd, state, batch)

    # --- 3b/3c. forward sub-attribution: occupancy sampling / field query ---
    from indoor_nerf_tpu.models.field import query_field
    from indoor_nerf_tpu.ops.occupancy import occupancy_z_vals

    def make_occ_zvals(state, batch):
        @jax.jit
        def run(state, batch):
            def body(carry, k):
                acc, ro = carry
                z = occupancy_z_vals(
                    k, ro, batch["rays_d"], near, far, state["occ"],
                    occupancy, n_occ, state["step"])
                s = jnp.sum(z)
                return (acc + s, ro + 1e-20 * s), None
            keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), batch["rays_o"]), keys)
            return acc
        return run

    timed("occ_zvals_only", make_occ_zvals, state, batch)

    def make_field_query(state, batch):
        z0 = jnp.linspace(2.0, 6.0, n_occ)[None, :, None]
        pts3 = (batch["rays_o"][:, None, :]
                + batch["rays_d"][:, None, :] * z0)

        @jax.jit
        def run(state, batch):
            def body(carry, _):
                acc, p3 = carry
                raw, _ = query_field(
                    state["params"], "coarse", p3, viewdirs, fc,
                    quant_state=None, train=True, step=state["step"])
                s = jnp.sum(raw)
                return (acc + s, p3 + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), pts3), None, length=n_steps)
            return acc
        return run

    timed("field_query_fwd_only", make_field_query, state, batch)

    # --- 3d. the bare MLP at the step's point count (fixed features) --------
    from indoor_nerf_tpu.models.field import encode_views
    from indoor_nerf_tpu.models.mlp import apply_nerf_small

    n_pts_mlp = n_rand * n_occ
    feats_fix = jnp.asarray(
        rng.normal(size=(n_pts_mlp, 32), scale=0.1), jnp.float32)
    dirs_fix = jnp.broadcast_to(
        viewdirs[:, None, :], (n_rand, n_occ, 3)).reshape(-1, 3)

    def make_mlp(state, feats_fix):
        vf = encode_views(dirs_fix, fc)

        @jax.jit
        def run(state, feats_fix):
            def body(carry, _):
                acc, f = carry
                raw = apply_nerf_small(
                    state["params"]["coarse"], f, vf)
                s = jnp.sum(raw)
                return (acc + s, f + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), feats_fix), None, length=n_steps)
            return acc
        return run

    timed("mlp_fwd_only", make_mlp, state, feats_fix)

    # --- 4/5. encode fwd / fwd+bwd at the step's point count ----------------
    n_pts = n_rand * n_occ
    pts = jnp.asarray(
        rng.uniform(-bbox, bbox, size=(n_pts, 3)), jnp.float32)
    table = state["params"]["table"]

    def make_enc_fwd(table, pts):
        @jax.jit
        def run(table, pts):
            def body(carry, _):
                acc, p = carry
                feats, _ = block_hash_encode(p, table, block_grid)
                s = jnp.sum(feats)
                return (acc + s, p + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), pts), None, length=n_steps)
            return acc
        return run

    timed("encode_fwd", make_enc_fwd, table, pts)

    def make_enc_bwd(table, pts):
        @jax.jit
        def run(table, pts):
            def loss(tb, p):
                feats, _ = block_hash_encode(p, tb, block_grid)
                return jnp.sum(feats ** 2)

            def body(carry, _):
                acc, tb = carry
                l, g = jax.value_and_grad(loss)(tb, pts)
                return (acc + l, tb - 1e-9 * g), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), table), None, length=n_steps)
            return acc
        return run

    timed("encode_fwd_bwd", make_enc_bwd, table, pts)

    # --- 6/7. raw row gather fwd / fwd+bwd (the memory op alone) ------------
    n_rows_total = table.shape[0]
    idx = jnp.asarray(
        rng.integers(0, n_rows_total, size=(n_pts * block_grid.n_levels,)),
        jnp.int32)

    def make_gather_fwd(table, idx):
        @jax.jit
        def run(table, idx):
            def body(carry, _):
                acc, tb = carry
                rows = jnp.take(tb, idx, axis=0)
                s = jnp.sum(rows)
                return (acc + s, tb + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), table), None, length=n_steps)
            return acc
        return run

    timed("row_gather_fwd", make_gather_fwd, table, idx)

    def make_gather_bwd(table, idx):
        @jax.jit
        def run(table, idx):
            def loss(tb):
                rows = jnp.take(tb, idx, axis=0)
                return jnp.sum(rows ** 2)

            def body(carry, _):
                acc, tb = carry
                l, g = jax.value_and_grad(loss)(tb)
                return (acc + l, tb - 1e-9 * g), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), table), None, length=n_steps)
            return acc
        return run

    timed("row_gather_fwd_bwd", make_gather_bwd, table, idx)

    # --- 8. RAdam update alone ----------------------------------------------
    def make_radam(params):
        opt = init_radam_state(params)

        @jax.jit
        def run(params):
            opt0 = init_radam_state(params)

            def body(carry, _):
                params, opt = carry
                grads = jax.tree_util.tree_map(lambda p: p * 1e-6, params)
                params, opt = radam_update(
                    grads, opt, params, 0.01, pocketnerf_hyper_fn)
                return (params, opt), None
            (params, opt), _ = jax.lax.scan(
                body, (params, opt0), None, length=n_steps)
            return jnp.sum(params["table"])
        return run

    timed("radam_update_only", make_radam, state["params"])

    # --- 9. occupancy refresh alone -----------------------------------------
    from indoor_nerf_tpu.models.field import sigma_query
    from indoor_nerf_tpu.ops.occupancy import occupancy_update

    def make_occ(state):
        @jax.jit
        def run(state):
            def body(carry, k):
                occ, acc = carry
                occ = occupancy_update(
                    k, occ,
                    lambda p: sigma_query(state["params"], "coarse", p, fc),
                    occupancy,
                )
                return (occ, acc + jnp.sum(occ["density"])), None
            keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
            (occ, acc), _ = jax.lax.scan(body, (state["occ"], jnp.zeros(())), keys)
            return acc
        return run

    timed("occupancy_refresh_only", make_occ, state)

    results["_config"] = {
        "n_rand": n_rand, "n_samples": n_samples, "n_steps": n_steps,
        "n_points": n_pts, "rows_gathered": int(idx.shape[0]),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
