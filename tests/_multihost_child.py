"""Child process for tests/test_multihost.py — one controller of a 2-process
multihost training run on the CPU Gloo backend.

Forces the CPU platform the same way tests/conftest.py does (the axon TPU
site hook re-forces JAX_PLATFORMS at interpreter start, so env vars alone
are not enough) and exposes 2 virtual local devices, so 2 processes form a
4-device global mesh — a faithful miniature of a multi-controller TPU pod
(every host runs this same program; SURVEY.md §5.8).

Not collected by pytest (no test_ prefix). Invoked as:
    python tests/_multihost_child.py --multihost --coordinator_address ...
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Force EXACTLY 2 local devices, replacing any inherited count (when run
# from pytest the parent's conftest already set 8).
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"]
)

import jax

jax.config.update("jax_platforms", "cpu")

from indoor_nerf_tpu.train.config import parse_args
from indoor_nerf_tpu.train.trainer import train

if __name__ == "__main__":
    train(parse_args(sys.argv[1:]))
    print(f"MULTIHOST_CHILD_DONE {jax.process_index()}")
