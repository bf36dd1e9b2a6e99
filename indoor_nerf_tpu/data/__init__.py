"""Dataset loaders and host-side ray pipelines."""

from indoor_nerf_tpu.data.synthetic import make_synthetic_scene
