"""Round-5 science campaign in ONE process (single TPU client).

The axon tunnel takes ~15 min to accept a NEW client connection after the
previous one exits (measured 01:40-02:30 this session: every fresh probe
right after a completed job hangs, then one eventually passes). Running
the whole campaign — A-CAQ post-fix validation, few-shot/jitter seeds,
the serving table, and the bench A/B — inside one long-lived process
pays that tax once, and reuses jit caches across seeds.

Stages are idempotent: each skips itself when its output JSON already
exists, so a killed/wedged campaign resumes by re-running this script.

Stage map (VERDICT round-4 items): acaq -> item 1; fewshot/jitter ->
items 3+5 / missing #1; serving -> items 4+7; bench A/B -> item 2.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import runpy


def _stage(name, out, argv):
    if os.path.exists(out):
        print(f"=== [{name}] SKIP ({out} exists)", flush=True)
        return
    print(f"=== [{name}] start {time.strftime('%H:%M:%S')}", flush=True)
    t0 = time.time()
    sys.argv = argv
    try:
        runpy.run_path(argv[0], run_name="__main__")
        print(f"=== [{name}] done in {time.time()-t0:.0f}s", flush=True)
    except SystemExit as e:  # argparse --help / sys.exit(0) are fine
        if e.code not in (0, None):
            print(f"=== [{name}] EXIT {e.code} after {time.time()-t0:.0f}s",
                  flush=True)
    except Exception:
        print(f"=== [{name}] FAILED after {time.time()-t0:.0f}s", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


def _bench(tag, out, tent_env=None):
    """Run bench.py in-process, capturing its one JSON line to a file.

    tent_env: dict of blockhash module globals to override for this run
    (the env-knob constants are read at trace time, so setattr works;
    bench.py builds a fresh jax.jit wrapper per call -> fresh trace).
    """
    if os.path.exists(out):
        print(f"=== [{tag}] SKIP ({out} exists)", flush=True)
        return
    import indoor_nerf_tpu.ops.blockhash as bh

    saved = {}
    if tent_env:
        for k, v in tent_env.items():
            saved[k] = getattr(bh, k)
            setattr(bh, k, v)
    print(f"=== [{tag}] start {time.strftime('%H:%M:%S')} env={tent_env}",
          flush=True)
    t0 = time.time()
    buf = io.StringIO()
    real = sys.stdout
    try:
        sys.stdout = buf
        sys.argv = ["bench.py"]
        runpy.run_path("bench.py", run_name="__main__")
    except Exception:
        sys.stdout = real
        print(buf.getvalue(), flush=True)
        print(f"=== [{tag}] FAILED after {time.time()-t0:.0f}s", flush=True)
        traceback.print_exc()
        return
    finally:
        sys.stdout = real
        for k, v in saved.items():
            setattr(bh, k, v)
    line = buf.getvalue().strip().splitlines()[-1]
    print(line, flush=True)
    with open(out, "w") as f:
        f.write(json.dumps({"tag": tag, "tent_env":
                            {k: str(v) for k, v in (tent_env or {}).items()},
                            "result": json.loads(line)}) + "\n")
    print(f"=== [{tag}] done in {time.time()-t0:.0f}s -> {out}", flush=True)


def _best_tent_variant():
    try:
        d = json.load(open("tpu_probe_tent_sweep.json"))
    except Exception:
        return None, None
    base = d.get("xla_fused", {}).get("ms", 1e9)
    best, bms = None, base
    for k, v in d.items():
        if (k.startswith("k_c") or k == "kernel_fused") and isinstance(v, dict):
            if v.get("ms", 1e9) < bms:
                best, bms = k, v["ms"]
    if best is None:
        return None, None
    if best == "kernel_fused":
        return best, {"USE_TENT_KERNEL": True}
    parts = best.split("_")  # k_c4096_bf16[_fuse][_mxu]
    return best, {
        "USE_TENT_KERNEL": True,
        "TENT_KERNEL_CHUNK": int(parts[1][1:]),
        "TENT_KERNEL_OUT": "bfloat16" if parts[2] == "bf16" else "float32",
        "TENT_KERNEL_FUSE": "fuse" in parts,
        "TENT_KERNEL_REDUCE": "mxu" if "mxu" in parts else "vpu",
    }


def main():
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    _stage("acaq", "acaq_r5_postfix_4000.json", [
        "scripts/acaq_experiment.py", "--iters", "4000", "--trace", "200",
        "--modes", "fp,fixed8,acaq", "--out", "acaq_r5_postfix_4000.json"])

    fewshot_arms = ("anneal,reg+anneal,regw01+anneal,regw003+anneal,"
                    "reglate+anneal,tdecay+anneal,tdecayw01+anneal,tdecay")
    for s in (0, 1, 2):
        _stage(f"fewshot_s{s}", f"fewshot_reg_cap10_s{s}.json", [
            "scripts/priors_experiment.py", "--iters", "2000",
            "--log2_rows", "10", "--arms", fewshot_arms,
            "--seed", str(s), "--out", f"fewshot_reg_cap10_s{s}.json"])
        _stage(f"jitter_s{s}", f"jitter_affine_s{s}.json", [
            "scripts/priors_experiment.py", "--iters", "2000",
            "--exposure_jitter", "0.25", "--jitter_test",
            "--arms", "appearance,appearance+anneal,reg+anneal",
            "--seed", str(s), "--out", f"jitter_affine_s{s}.json"])

    _stage("serving", "serving_table_r5.json", [
        "scripts/serving_table.py",
        "--arms",
        "k1:nf=16,nc=64,k=1;"
        "int8sigk1_sqrt:nf=16,nc=64,k=1,dt=int8sig,se=sqrt;"
        "int8sigk1_log:nf=16,nc=64,k=1,dt=int8sig,se=log1p;"
        "nf12k1:nf=12,nc=64,k=1",
        "--out", "serving_table_r5.json"])

    # Kernel-variant sweep LAST among the science: 11 Mosaic compiles are
    # the wedge-risky step (CLAUDE.md), so they must not gate the results
    # above. Incremental dump inside the probe preserves partial sweeps.
    _stage("tent_sweep", "tpu_probe_tent_sweep.json", [
        "scripts/probe_tent_kernel.py", "--out", "tpu_probe_tent_sweep.json"])

    _bench("bench_off", "bench_r5_off.json")
    name, env = _best_tent_variant()
    if env is not None:
        print(f"best tent variant: {name}", flush=True)
        _bench("bench_tent_best", "bench_r5_tent_best.json", env)
    else:
        print("no winning tent variant (or no probe data); skipping bench_on",
              flush=True)
    print("=== campaign complete", flush=True)


if __name__ == "__main__":
    main()
