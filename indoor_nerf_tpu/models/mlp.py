"""NeRF MLPs as pure param-pytree functions.

- ``NeRFSmall`` (Instant-NGP-style sigma + color nets,
  reference: PocketNeRF/run_nerf_helpers.py:169-306)
- classic big ``NeRF`` (8x256 with skip, reference: run_nerf_helpers.py:84-136)

Fixed reference bugs (documented divergences):
- ``predict_normals`` is a real constructor flag here; the reference reads
  ``self.predict_normals`` without ever assigning it
  (run_nerf_helpers.py:258) and passes it as an unaccepted kwarg
  (run_nerf.py:268), a latent TypeError/AttributeError.
- the big NeRF accepts (and ignores) no quantization kwargs; the reference
  passes them and would crash (run_nerf.py:249-253).

Matmuls run through one helper that up-casts to the MXU-preferred layout;
params stay float32 (they are tiny), activations can be bfloat16 on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def init_linear(
    key: jax.Array, in_dim: int, out_dim: int, bias: bool = True
) -> Params:
    """Torch-default Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Matches nn.Linear's kaiming_uniform_(a=sqrt(5)) weight bound and the
    default bias bound, so param statistics match the reference at init.
    Weights are stored as ``[in_dim, out_dim]`` (JAX convention, x @ W).
    """
    bound = 1.0 / np.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    p = {"w": jax.random.uniform(wkey, (in_dim, out_dim), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_dim,), jnp.float32, -bound, bound)
    return p


def _linear(p: Params, x: jnp.ndarray, w_override: Optional[jnp.ndarray] = None,
            compute_dtype: Optional[Any] = None) -> jnp.ndarray:
    """Matmul with optional reduced compute precision: params stay float32
    masters, inputs/weights cast to ``compute_dtype`` (e.g. bfloat16 for the
    MXU's native path) with float32 accumulation."""
    w = p["w"] if w_override is None else w_override
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# --- NeRFSmall ----------------------------------------------------------------


def init_nerf_small(
    key: jax.Array,
    input_ch: int = 32,
    input_ch_views: int = 16,
    num_layers: int = 2,
    hidden_dim: int = 64,
    geo_feat_dim: int = 15,
    num_layers_color: int = 3,
    hidden_dim_color: int = 64,
    predict_normals: bool = False,
) -> Params:
    """Init NeRFSmall params (reference: run_nerf_helpers.py:169-263).

    sigma net: ``num_layers`` bias-free Linears, last outputs 1 + geo_feat_dim.
    color net: ``num_layers_color`` bias-free Linears over [views, geo_feat].
    optional normal net: 2-layer biased MLP geo_feat -> hidden//2 -> 3.
    """
    keys = jax.random.split(key, num_layers + num_layers_color + 2)
    sigma_net: List[Params] = []
    for l in range(num_layers):
        in_dim = input_ch if l == 0 else hidden_dim
        out_dim = 1 + geo_feat_dim if l == num_layers - 1 else hidden_dim
        sigma_net.append(init_linear(keys[l], in_dim, out_dim, bias=False))

    color_net: List[Params] = []
    for l in range(num_layers_color):
        in_dim = input_ch_views + geo_feat_dim if l == 0 else hidden_dim_color
        out_dim = 3 if l == num_layers_color - 1 else hidden_dim_color
        color_net.append(
            init_linear(keys[num_layers + l], in_dim, out_dim, bias=False)
        )

    params: Params = {"sigma_net": sigma_net, "color_net": color_net}
    if predict_normals:
        params["normal_net"] = [
            init_linear(keys[-2], geo_feat_dim, hidden_dim // 2, bias=True),
            init_linear(keys[-1], hidden_dim // 2, 3, bias=True),
        ]
    return params


def apply_nerf_small(
    params: Params,
    input_pts: jnp.ndarray,
    input_views: Optional[jnp.ndarray],
    predict_normals: bool = False,
    weight_quant: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    act_quants: Optional[Sequence[Callable[[jnp.ndarray], jnp.ndarray]]] = None,
    compute_dtype: Optional[Any] = None,
) -> jnp.ndarray:
    """Forward NeRFSmall (reference: run_nerf_helpers.py:265-306).

    Args:
      input_pts: ``[N, input_ch]`` hash features.
      input_views: ``[N, input_ch_views]`` SH view features (or None).
      weight_quant: optional fake-quantizer applied to the FIRST sigma-layer
        weight (reference: run_nerf_helpers.py:272-276).
      act_quants: optional fake-quantizers applied to each hidden sigma
        activation after ReLU (reference: run_nerf_helpers.py:283-284).

    Returns ``[N, 4]`` (rgb_logits, sigma) or ``[N, 7]`` (+unit normals).
    Note rgb is returned as raw logits; compositing applies the sigmoid
    (reference: run_nerf_helpers.py:295-296 with run_nerf.py:369).
    """
    sigma_net = params["sigma_net"]
    h = input_pts
    for l, layer in enumerate(sigma_net):
        if l == 0 and weight_quant is not None:
            h = _linear(layer, h, w_override=weight_quant(layer["w"]),
                        compute_dtype=compute_dtype)
        else:
            h = _linear(layer, h, compute_dtype=compute_dtype)
        if l != len(sigma_net) - 1:
            h = jax.nn.relu(h)
            if act_quants is not None:
                h = act_quants[l](h)

    sigma, geo_feat = h[..., :1], h[..., 1:]

    h = geo_feat if input_views is None else jnp.concatenate(
        [input_views, geo_feat], axis=-1
    )
    color_net = params["color_net"]
    for l, layer in enumerate(color_net):
        h = _linear(layer, h, compute_dtype=compute_dtype)
        if l != len(color_net) - 1:
            h = jax.nn.relu(h)
    color = h  # raw logits; sigmoid applied in raw2outputs

    if predict_normals:
        n = _linear(params["normal_net"][0], geo_feat)
        n = jax.nn.relu(n)
        n = _linear(params["normal_net"][1], n)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return jnp.concatenate([color, sigma, n], axis=-1)
    return jnp.concatenate([color, sigma], axis=-1)


# --- Classic big NeRF ---------------------------------------------------------


def init_nerf_big(
    key: jax.Array,
    D: int = 8,
    W: int = 256,
    input_ch: int = 3,
    input_ch_views: int = 3,
    output_ch: int = 4,
    skips: Sequence[int] = (4,),
    use_viewdirs: bool = False,
) -> Params:
    """Init the classic NeRF MLP (reference: run_nerf_helpers.py:84-111)."""
    n_keys = D + 5
    keys = jax.random.split(key, n_keys)
    pts_linears = [init_linear(keys[0], input_ch, W)]
    for i in range(D - 1):
        in_dim = W + input_ch if i in skips else W
        pts_linears.append(init_linear(keys[i + 1], in_dim, W))
    params: Params = {"pts_linears": pts_linears}
    if use_viewdirs:
        params["feature_linear"] = init_linear(keys[D], W, W)
        params["alpha_linear"] = init_linear(keys[D + 1], W, 1)
        params["views_linears"] = [init_linear(keys[D + 2], input_ch_views + W, W // 2)]
        params["rgb_linear"] = init_linear(keys[D + 3], W // 2, 3)
    else:
        params["output_linear"] = init_linear(keys[D + 4], W, output_ch)
    return params


def apply_nerf_big(
    params: Params,
    input_pts: jnp.ndarray,
    input_views: Optional[jnp.ndarray],
    use_viewdirs: bool = False,
    skips: Sequence[int] = (4,),
) -> jnp.ndarray:
    """Forward the classic NeRF MLP (reference: run_nerf_helpers.py:113-136)."""
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_linear(layer, h))
        if i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    if use_viewdirs:
        alpha = _linear(params["alpha_linear"], h)
        feature = _linear(params["feature_linear"], h)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(_linear(layer, h))
        rgb = _linear(params["rgb_linear"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _linear(params["output_linear"], h)
