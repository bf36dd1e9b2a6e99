"""indoor_nerf_tpu — a TPU-native (JAX / XLA / Pallas / pjit) NeRF framework.

A from-scratch rebuild of the capabilities of ryanjsuh/indoor-nerf
("PocketNeRF": fast-converging hash-encoded NeRF for indoor few-shot
reconstruction, with Manhattan-world structural priors and A-CAQ learned
bitwidth quantization), designed TPU-first:

- multiresolution hash encoding as fused, vectorized XLA gathers and an
  optional Pallas fused ray-march kernel (``indoor_nerf_tpu.ops.pallas``)
- a purely functional core: train state is a pytree, all schedules are
  functions of the step, RNG is explicit
- data-parallel ray sharding over a ``jax.sharding.Mesh`` with XLA
  collectives; optional level-sharded (tensor-parallel) hash tables
- the reference CLI, configs, dataset loaders, metrics artifacts and
  checkpoint/resume semantics are preserved.

Reference citations in docstrings are ``file:line`` into the PyTorch
reference under ``/root/reference/PocketNeRF``.
"""

__version__ = "0.1.0"
