"""CLI entry point, invocation-compatible with the reference:

    python run_nerf.py --config configs/chair.txt [--flag value ...]

(reference: PocketNeRF/run_nerf.py:1485-1488 — minus the global CUDA tensor
default; device selection is JAX's.)
"""

from indoor_nerf_tpu.train.config import parse_args
from indoor_nerf_tpu.train.trainer import train

if __name__ == "__main__":
    train(parse_args())
