"""Interactive quantizer debug harness (print-based).

Equivalent of the reference's debug.py: exercises the learned-bitwidth
quantizer on hash-embedding-scale inputs (~1e-4) across bitwidths and
prints output statistics, unique-value counts vs 2^bits, and error
magnitudes. The same checks live as assertions in
tests/test_quantization.py; this harness is for eyeballing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from indoor_nerf_tpu.losses.quantization import (
    QuantConfig,
    calibrate,
    init_quant_state,
    learned_fake_quant,
)


def inspect(bits: float, scale: float = 1e-4, n: int = 8192):
    cfg = QuantConfig(n_embed_levels=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-scale, scale, size=(n,)).astype(np.float32))
    group = {k: v[0] for k, v in init_quant_state(cfg)["act"].items()}
    group = calibrate(group, x, symmetric=False)
    group = dict(group, soft_bits=jnp.asarray(bits))
    q = learned_fake_quant(x, group, cfg, symmetric=False, train=False)

    err = np.abs(np.asarray(q - x))
    uniq = len(np.unique(np.asarray(q)))
    print(f"bits={bits:5.1f} scale={scale:g}")
    print(f"  in : mean={float(jnp.mean(x)):+.3e} std={float(jnp.std(x)):.3e} "
          f"range=[{float(x.min()):+.3e}, {float(x.max()):+.3e}]")
    print(f"  out: mean={float(jnp.mean(q)):+.3e} std={float(jnp.std(q)):.3e}")
    print(f"  unique values: {uniq} (<= 2^{int(bits)} = {2**int(bits)})")
    print(f"  max |err|: {err.max():.3e}  mean |err|: {err.mean():.3e}")
    print()


if __name__ == "__main__":
    for bits in (2.0, 4.0, 8.0, 16.0):
        inspect(bits)
    inspect(8.0, scale=1.0)  # sanity at unit scale
    print("STE gradient check (should be exactly 1.0):")
    cfg = QuantConfig(n_embed_levels=1)
    x = jnp.linspace(-1e-4, 1e-4, 64)
    group = {k: v[0] for k, v in init_quant_state(cfg)["act"].items()}
    group = calibrate(group, x, symmetric=False)
    g = jax.grad(lambda x: jnp.sum(
        learned_fake_quant(x, group, cfg, symmetric=False, train=True)))(x)
    print("  grad:", np.unique(np.asarray(g)))
