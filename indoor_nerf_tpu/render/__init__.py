"""Rendering pipeline: jitted ray rendering and full-image tiling."""

from indoor_nerf_tpu.render.renderer import (
    RenderConfig,
    render_rays,
    render_image,
    make_image_renderer,
)
from indoor_nerf_tpu.render.appearance import (
    eval_view_with_fitted_latent,
    fit_view_latent,
)
