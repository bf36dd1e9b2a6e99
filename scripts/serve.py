"""Minimal render server: serve novel views from a trained checkpoint.

The reference has no serving layer (SURVEY.md §1: "no serving layer");
this exposes the jitted tiled renderer over HTTP using only the standard
library. The model compiles once at startup; each request renders one pose.

  python scripts/serve.py --config configs/chair.txt [--port 8000]
      [--width 400 --height 400] [--baked [--baked_res 256]]

--baked bakes the checkpoint into the deferred-shading snapshot
(render/baked.py) at startup and serves from it — interactive frame rates
at a documented quality trade (DIVERGENCES.md).

API:
  GET  /health              -> {"status": "ok", "step": N}
  POST /render              body: {"c2w": [[...3x4...]], "format": "png"}
                            -> image/png (or .npy with format "npy")
  GET  /render?theta=..&phi=..&radius=..   spherical orbit shortcut
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def build(args):
    import jax

    from indoor_nerf_tpu.data.load import load_dataset
    from indoor_nerf_tpu.render.renderer import make_image_renderer
    from indoor_nerf_tpu.train.config import parse_args
    from indoor_nerf_tpu.train.trainer import build_train_config, mangle_expname
    from indoor_nerf_tpu.train.step import init_train_state
    from indoor_nerf_tpu.utils.checkpoint import maybe_resume

    # The documented invocation separates server flags from training flags
    # with a bare "--" (docs/SERVING.md); argparse.REMAINDER passes the
    # literal separator through, and the training parser rejects it.
    train_args = list(args.train_args)
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    cli = parse_args(train_args)
    scene = load_dataset(cli)
    cfg = build_train_config(cli, scene)
    state = init_train_state(jax.random.PRNGKey(cli.seed), cfg)
    import os

    logdir = os.path.join(cli.basedir, mangle_expname(cli))
    state = maybe_resume(logdir, state, cli.ft_path, no_reload=False)
    step = int(np.asarray(jax.device_get(state["step"])))
    if step == 0:
        print("⚠️  serving an UNTRAINED model (no checkpoint found in "
              f"{logdir})")

    H = args.height or scene.hwf[0]
    W = args.width or scene.hwf[1]
    focal = scene.hwf[2] * (W / scene.hwf[1])
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    if getattr(args, "baked", False):
        from indoor_nerf_tpu.render.baked import (
            bake_field,
            make_baked_image_renderer,
        )

        import os as _os

        from indoor_nerf_tpu.render.baked import load_baked, save_baked

        snap = getattr(args, "snapshot", None)
        if snap and _os.path.exists(snap):
            baked = load_baked(snap)
            print(f"loaded snapshot {snap}")
        else:
            print(f"baking snapshot at {args.baked_res}^3 ...")
            t0 = time.perf_counter()
            # Visibility-cull from the training cameras (floaters in
            # never-observed regions otherwise densify onto the grid).
            Ht, Wt = int(scene.hwf[0]), int(scene.hwf[1])
            Kt = np.array([[scene.hwf[2], 0, 0.5 * Wt],
                           [0, scene.hwf[2], 0.5 * Ht], [0, 0, 1]],
                          np.float32)
            train_cams = {
                "poses": np.asarray(scene.poses)[scene.i_train][:, :3, :4],
                "K": scene.K if scene.K is not None else Kt,
                "H": Ht, "W": Wt,
                "near": scene.near, "far": scene.far,
            }
            baked = bake_field(state["params"], cfg.render.field,
                               resolution=args.baked_res,
                               table_dtype=getattr(args, "baked_dtype",
                                                   "bfloat16"),
                               train_cameras=train_cams,
                               geo_resolution=getattr(
                                   args, "baked_geo_res", 0))
            print(f"baked in {time.perf_counter() - t0:.1f}s")
            if snap:
                save_baked(snap, baked)
                print(f"saved snapshot to {snap}")
        g = getattr(args, "guided", 0)
        baked_renderer = make_baked_image_renderer(
            baked, int(H), int(W),
            n_samples=(16 if g else 128), guided=g, n_coarse=64,
        )

        def render(c2w):
            t0 = time.perf_counter()
            out = baked_renderer(np.asarray(c2w, np.float32)[:3, :4], K,
                                 scene.near, scene.far)
            rgb = np.asarray(out["rgb_map"])
            return rgb, time.perf_counter() - t0

        return render, step, (int(H), int(W))

    tile = 2048 if cli.i_embed == 3 else 8192
    renderer = make_image_renderer(cfg.render.test_mode(), int(H), int(W), tile)

    def render(c2w):
        t0 = time.perf_counter()
        out = renderer(state["params"], np.asarray(c2w, np.float32)[:3, :4],
                       K, scene.near, scene.far, state["quant"], state["occ"])
        rgb = np.asarray(out["rgb_map"])
        return rgb, time.perf_counter() - t0

    return render, step, (int(H), int(W))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--baked", action="store_true",
                    help="bake the field at startup; serve from the "
                         "deferred-shading snapshot (render/baked.py)")
    ap.add_argument("--baked_res", type=int, default=256)
    ap.add_argument("--baked_geo_res", type=int, default=-1,
                    help="pass-2 geo table resolution (-1 = baked_res/2, "
                         "the quality-free flagship default; 0 = "
                         "baked_res)")
    ap.add_argument("--baked_dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8", "int8sig",
                             "int8geo"])
    ap.add_argument("--snapshot", default=None,
                    help="path to save/load the baked snapshot (loads it "
                         "if the file exists, else bakes and saves)")
    ap.add_argument("--guided", type=int, default=0,
                    help="with --baked: depth-guided two-level rendering "
                         "(coarse downsample factor, e.g. 4 — ~2.6x fewer "
                         "row fetches per frame at equal quality)")
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="the training CLI flags identifying the run "
                         "(e.g. --config configs/chair.txt ...)")
    args = ap.parse_args()

    from indoor_nerf_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # INDOOR_NERF_PLATFORM=cpu escapes a wedged TPU backend

    render, step, hw = build(args)
    from indoor_nerf_tpu.data.poses import pose_spherical

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/health":
                self._send(200, json.dumps(
                    {"status": "ok", "step": step, "resolution": hw}
                ).encode())
            elif url.path == "/render":
                q = parse_qs(url.query)
                theta = float(q.get("theta", ["0"])[0])
                phi = float(q.get("phi", ["-30"])[0])
                radius = float(q.get("radius", ["4"])[0])
                self._render(pose_spherical(theta, phi, radius), "png")
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if urlparse(self.path).path != "/render":
                return self._send(404, b'{"error": "not found"}')
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                c2w = np.asarray(req["c2w"], np.float32)
                fmt = req.get("format", "png")
            except Exception as e:
                return self._send(400, json.dumps(
                    {"error": f"bad request: {e}"}).encode())
            self._render(c2w, fmt)

        def _render(self, c2w, fmt):
            rgb, dt = render(c2w)
            if fmt == "npy":
                buf = io.BytesIO()
                np.save(buf, rgb)
                self._send(200, buf.getvalue(), "application/octet-stream")
            else:
                import imageio.v2 as imageio

                buf = io.BytesIO()
                imageio.imwrite(buf, (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                                format="png")
                self._send(200, buf.getvalue(), "image/png")
            print(f"rendered in {dt:.2f}s")

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (step {step}, {hw[0]}x{hw[1]})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
