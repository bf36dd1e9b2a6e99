"""Real multi-controller training test: 2 OS processes, jax.distributed.

The reference is strictly single-process/single-GPU (SURVEY.md §2:
"Parallelism strategies present in the reference: none"); this framework
adds multi-controller pod training (--multihost). Here we actually run it:
two separate Python processes, each owning 2 virtual CPU devices, joined
through jax.distributed (Gloo collectives) into one 4-device data mesh.
Each host samples N_rand/2 rays (per-host seeding) and the global batch is
assembled with make_array_from_process_local_data — exactly the production
code path of train/trainer.py, not a simulation.

Checks: both controllers finish, see the 4-device global mesh, compute
bit-identical per-iteration losses (the collectives make training state
globally consistent), and only process 0 writes checkpoints.
"""

import glob
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.nightly
def test_two_process_multihost_training(tmp_path):
    port = _free_port()
    argv_common = [
        sys.executable, os.path.join(REPO, "tests", "_multihost_child.py"),
        "--expname", "mh",
        "--basedir", str(tmp_path),
        "--dataset_type", "synthetic",
        "--use_viewdirs",
        "--white_bkgd",
        "--N_rand", "128",
        "--N_samples", "16",
        "--N_importance", "0",
        "--finest_res", "64",
        "--log2_hashmap_size", "12",
        "--lrate", "0.01",
        "--n_iters", "15",
        "--i_print", "5",
        "--i_weights", "10",
        # Keep eval renders / videos out of this test: the sharded eval
        # renderer is exercised in test_sp_render.py; here the point is the
        # multi-controller train step.
        "--i_testset", "100000",
        "--i_video", "100000",
        "--testskip", "1",
        "--multihost",
        "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", "2",
    ]
    # Append, never overwrite, PYTHONPATH: overwriting drops the ambient
    # /root/.axon_site entry and kills the TPU backend registration
    # (CLAUDE.md). The child force-sets CPU via jax.config regardless.
    env = dict(
        os.environ,
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            argv_common + ["--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process {i} failed:\n{out}"

    for i, out in enumerate(outs):
        assert f"MULTIHOST_CHILD_DONE {i}" in out
        assert f"[multihost] process {i}/2" in out
        assert "global_devices=4" in out

    # Collectives make the training state globally consistent: every
    # controller must report bit-identical losses.
    loss_re = re.compile(r"\[TRAIN\] Iter: (\d+) Loss: ([0-9.eE+-]+)")
    losses = [dict(loss_re.findall(out)) for out in outs]
    assert losses[0] and losses[0] == losses[1], (losses, outs[0][-2000:])

    # Only process 0 writes checkpoints; the logdir has them.
    logdirs = glob.glob(os.path.join(str(tmp_path), "mh*"))
    assert logdirs, os.listdir(str(tmp_path))
    ckpts = glob.glob(os.path.join(logdirs[0], "*.ckpt"))
    assert ckpts, os.listdir(logdirs[0])
    assert "Saved checkpoints at" in outs[0]
    # The single-writer rule: process 1 must not have written anything.
    assert "Saved checkpoints at" not in outs[1]
    assert "Saved checkpoints at" not in outs[1]
