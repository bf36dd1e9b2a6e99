"""Isolated timing of the grouped vs ungrouped block-hash encode on TPU.

The flagship-step ablation showed no win from --ray_groups despite 31%
fewer scatter/gather rows; this probe times the encode alone (fwd and
fwd+bwd) at the step's exact shapes to locate where the expected win
goes. One variant per process (axon-tunnel compiles are minutes).

Usage: PYTHONPATH=. python scripts/probe_grouped_encode.py \
    [--groups 4,4,4,4,2,2,2,2,1,1,1,1,1,1,1,1] [--steps 20] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--groups", type=str, default=None,
                    help="comma list; omit for the ungrouped baseline")
    ap.add_argument("--n_rand", type=int, default=4096)
    ap.add_argument("--n_samples", type=int, default=48)
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--skip_coords", action="store_true")
    ap.add_argument("--bwd_parts", action="store_true",
                    help="time grouped-backward constituents (coords "
                         "recompute / cot+group-sum / scatters) instead")
    ap.add_argument("--out", type=str, default="tpu_probe_grouped.json")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    import jax
    import jax.numpy as jnp

    from indoor_nerf_tpu.ops.blockhash import (
        BlockHashConfig,
        block_hash_encode,
        block_hash_encode_grouped,
    )

    bbox = 1.5
    bb = ((-bbox,) * 3, (bbox,) * 3)
    groups = (tuple(int(v) for v in args.groups.split(","))
              if args.groups else None)
    cfg = BlockHashConfig(
        bbox_min=bb[0], bbox_max=bb[1], n_levels=16, log2_rows=13,
        base_resolution=16, finest_resolution=512, block_size=3,
        gather_dtype="bfloat16", scatter_dtype="bfloat16",
        ray_groups=groups,
    )

    Rn, S = args.n_rand, args.n_samples
    rng = np.random.default_rng(0)
    # Ray-structured points: origins on a shell, sorted samples through the
    # bbox (timing is shape-static, but keep the content realistic anyway).
    d = rng.normal(size=(Rn, 3))
    o = 4.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    aim = rng.uniform(-bbox, bbox, size=(Rn, 3))
    dirs = aim - o
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t = np.sort(rng.uniform(2.0, 6.0, size=(Rn, S)), axis=1)
    pts = jnp.asarray(o[:, None, :] + t[..., None] * dirs[:, None, :],
                      jnp.float32)

    table = jnp.asarray(
        rng.normal(size=(cfg.n_levels * cfg.rows_per_level,
                         cfg.n_features_per_level * cfg.lanes_per_feature),
                   scale=1e-2), jnp.float32)

    def encode(tb, p):
        if groups is not None:
            f, _ = block_hash_encode_grouped(p, tb, cfg)
        else:
            f, _ = block_hash_encode(p.reshape(-1, 3), tb, cfg)
        return f

    n_steps = args.steps
    results = {"groups": args.groups, "n_rand": Rn, "n_samples": S}

    def timed(name, fn, *ops):
        out = fn(*ops)
        float(out)
        t0 = time.perf_counter()
        out = fn(*ops)
        float(out)
        dt = (time.perf_counter() - t0) / n_steps * 1000.0
        results[name] = round(dt, 2)
        print(f"{name:24s} {dt:8.2f} ms")

    if args.bwd_parts:
        from indoor_nerf_tpu.ops.blockhash import (
            _cot_rows,
            _grouped_classes,
            _grouped_coords,
            _scatter_cot,
            _tile_coords,
        )

        assert groups is not None
        classes = _grouped_classes(cfg, S)
        F = cfg.n_features_per_level

        @jax.jit
        def run_coords(p):
            def body(carry, _):
                acc, pp = carry
                s = jnp.zeros(())
                for G, lv in classes:
                    if G == 1:
                        fr, pc, _ = _tile_coords(pp.reshape(-1, 3), cfg, lv)
                    else:
                        fr, pc = _grouped_coords(pp, cfg, lv, G)
                    s = s + jnp.sum(pc) + jnp.sum(fr.astype(jnp.float32))
                return (acc + s, pp + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), p), None, length=n_steps)
            return acc

        if not args.skip_coords:
            timed("bwd_coords_recompute", run_coords, pts)

        # Precompute coords + per-class cotangents once; time scatters only.
        g_full = jnp.asarray(
            rng.normal(size=(Rn, S, cfg.n_levels * F)), jnp.float32)
        pre = []
        for G, lv in classes:
            Lc, c0 = len(lv), lv[0]
            g_c = g_full[..., c0 * F:(c0 + Lc) * F]
            if G == 1:
                fr, pc, _ = _tile_coords(pts.reshape(-1, 3), cfg, lv)
                cot = _cot_rows(
                    pc, g_c.reshape(-1, Lc, F).reshape(-1, F), cfg
                ).astype(jnp.bfloat16)
            else:
                fr, pc = _grouped_coords(pts, cfg, lv, G)
                SG = S // G
                cot_s = _cot_rows(
                    pc.reshape(-1, 3),
                    g_c.reshape(Rn, SG, G, Lc, F).reshape(-1, F), cfg)
                W = cot_s.shape[1]
                cot = (cot_s.reshape(Rn, SG, G, Lc, W).sum(axis=2)
                       .reshape(Rn * SG * Lc, W).astype(jnp.bfloat16))
            pre.append((jax.device_put(cot), jax.device_put(fr)))
        meta = [(Lc, c0) for (_, lv) in classes
                for Lc, c0 in [(len(lv), lv[0])]]

        @jax.jit
        def run_scatters(ops):
            def body(carry, _):
                acc, scale = carry
                gt = None
                for (cot, fr), (Lc, c0) in zip(ops, meta):
                    gc = _scatter_cot(
                        (cot.astype(jnp.float32) * scale
                         ).astype(jnp.bfloat16), fr, Lc, c0, cfg)
                    gt = gc if gt is None else gt + gc
                s = jnp.sum(gt)
                return (acc + s, scale + 1e-20 * s), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), jnp.ones(())), None, length=n_steps)
            return acc

        timed("bwd_scatters_only", run_scatters, pre)

        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(results))
        return

    @jax.jit
    def run_fwd(tb, p):
        def body(carry, _):
            acc, pp = carry
            s = jnp.sum(encode(tb, pp))
            return (acc + s, pp + 1e-20 * s), None
        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), p), None, length=n_steps)
        return acc

    timed("encode_fwd", run_fwd, table, pts)

    if not args.fwd_only:
        @jax.jit
        def run_bwd(tb, p):
            def loss(tb2, pp):
                return jnp.sum(encode(tb2, pp) ** 2)

            def body(carry, _):
                acc, tb2 = carry
                l, g = jax.value_and_grad(loss)(tb2, p)
                return (acc + l, tb2 - 1e-9 * g), None
            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), tb), None, length=n_steps)
            return acc

        timed("encode_fwd_bwd", run_bwd, table, pts)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

