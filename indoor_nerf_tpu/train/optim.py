"""RAdam optimizer as a pure pytree transform, with per-group hyperparameters.

TPU-native equivalent of the reference's RAdam (reference:
PocketNeRF/radam.py:5-94) and the two param groups it is built with —
network params with weight_decay=1e-6 and hash embeddings with eps=1e-15,
lr=0.01, betas=(0.9, 0.99) (reference: run_nerf.py:281-285).

Differences from a stock Adam worth noting (all faithful to the reference):
- the rectification term N_sma gates the adaptive update: for the first few
  steps (N_sma < 5, i.e. t <= 5 at beta2=0.99) parameters are NOT updated
  (degenerated_to_sgd=False default) while the moments still accumulate;
- the denominator sqrt(nu) is not bias-corrected separately — the
  (1 - beta2^t) factor lives inside the rectified step size;
- weight decay is decoupled (AdamW-style p -= wd * lr * p), applied only on
  steps that update.

The whole update is branch-free (a scalar ``where`` on the shared N_sma
condition), so it jits into one fused program and runs identically when the
gradients arrive from a ``psum`` over a device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


@dataclasses.dataclass(frozen=True)
class RAdamHyper:
    """Static RAdam hyperparameters for one param group."""

    beta1: float = 0.9
    beta2: float = 0.99
    eps: float = 1e-8
    weight_decay: float = 0.0
    degenerated_to_sgd: bool = False


def init_radam_state(params: Pytree) -> Dict[str, Pytree]:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {
        "mu": zeros,
        "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }


def exp_decay_lr(lrate: float, lrate_decay: int, step: jnp.ndarray) -> jnp.ndarray:
    """lr = lrate * 0.1^(step / (lrate_decay * 1000))
    (reference: run_nerf.py:1289-1293)."""
    decay_steps = lrate_decay * 1000.0
    return lrate * jnp.power(0.1, step.astype(jnp.float32) / decay_steps)


def radam_update(
    grads: Pytree,
    state: Dict[str, Pytree],
    params: Pytree,
    lr: jnp.ndarray,
    hyper_fn: Callable[[Tuple], RAdamHyper],
) -> Tuple[Pytree, Dict[str, Pytree]]:
    """One RAdam step. ``hyper_fn(path)`` maps a leaf key-path to its group's
    hyperparameters (the param-group mechanism, reference: run_nerf.py:281-285).

    Returns (new_params, new_state).
    """
    t = state["step"] + 1
    tf = t.astype(jnp.float32)

    def leaf_update(path, p, g, mu, nu):
        h = hyper_fn(path)
        beta1, beta2 = h.beta1, h.beta2
        new_nu = beta2 * nu + (1.0 - beta2) * (g * g)
        new_mu = beta1 * mu + (1.0 - beta1) * g

        beta2_t = jnp.power(beta2, tf)
        n_sma_max = 2.0 / (1.0 - beta2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / (1.0 - beta2_t)

        rect = jnp.sqrt(
            jnp.clip(
                (1.0 - beta2_t)
                * (n_sma - 4.0) / (n_sma_max - 4.0)
                * (n_sma - 2.0) / n_sma
                * n_sma_max / (n_sma_max - 2.0),
                min=0.0,
            )
        ) / (1.0 - jnp.power(beta1, tf))

        adaptive = n_sma >= 5.0
        decayed = p - h.weight_decay * lr * p if h.weight_decay != 0.0 else p
        p_adaptive = decayed - lr * rect * new_mu / (jnp.sqrt(new_nu) + h.eps)
        if h.degenerated_to_sgd:
            sgd_step = 1.0 / (1.0 - jnp.power(beta1, tf))
            p_plain = decayed - lr * sgd_step * new_mu
        else:
            p_plain = p  # no update while N_sma < 5 (reference: radam.py:78,88)
        new_p = jnp.where(adaptive, p_adaptive, p_plain)
        return new_p, new_mu, new_nu

    flat_p = jax.tree_util.tree_flatten_with_path(params)
    treedef = flat_p[1]
    paths = [kp for kp, _ in flat_p[0]]
    p_leaves = [v for _, v in flat_p[0]]
    g_leaves = jax.tree_util.tree_leaves(grads)
    mu_leaves = jax.tree_util.tree_leaves(state["mu"])
    nu_leaves = jax.tree_util.tree_leaves(state["nu"])

    new_p, new_mu, new_nu = [], [], []
    for path, p, g, mu, nu in zip(paths, p_leaves, g_leaves, mu_leaves, nu_leaves):
        np_, nmu, nnu = leaf_update(path, p, g, mu, nu)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)

    new_params = jax.tree_util.tree_unflatten(treedef, new_p)
    new_state = {
        "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
        "nu": jax.tree_util.tree_unflatten(treedef, new_nu),
        "step": t,
    }
    return new_params, new_state


def pocketnerf_hyper_fn(path) -> RAdamHyper:
    """The reference's two param groups (run_nerf.py:281-285): hash table
    embeddings get eps=1e-15 and no weight decay; everything else gets
    weight_decay=1e-6 and the default eps."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if keys and keys[0] == "table":
        return RAdamHyper(eps=1e-15, weight_decay=0.0)
    return RAdamHyper(eps=1e-8, weight_decay=1e-6)
