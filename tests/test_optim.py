"""Golden unit tests for the RAdam optimizer against a numpy transcription
of the reference math (PocketNeRF/radam.py:5-94).

COVERAGE.md previously relied on "convergence is the test" for RAdam; a
silent rectification-term bug that merely slows convergence would pass the
end-to-end suite. These tests step both reference param groups
(net: weight_decay=1e-6 / eps=1e-8; tables: eps=1e-15, no decay —
run_nerf.py:281-285) for 10 steps with beta2=0.99, which crosses the
N_sma >= 5 rectification threshold between t=5 (N_sma ~ 4.92, no update)
and t=6 (N_sma ~ 5.93, first adaptive update), and compare every parameter
trajectory elementwise.
"""

import numpy as np
import jax.numpy as jnp

from indoor_nerf_tpu.train.optim import (
    RAdamHyper,
    init_radam_state,
    radam_update,
    pocketnerf_hyper_fn,
)


def radam_reference_numpy(params, grads_seq, lr, beta1, beta2, eps,
                          weight_decay, degenerated_to_sgd=False):
    """Pure-numpy RAdam transcribed from the published RAdam update rule
    (Liu et al. 2020), matching PocketNeRF/radam.py:28-94 semantics:

    - moments: nu_t = b2*nu + (1-b2)*g^2, mu_t = b1*mu + (1-b1)*g
    - N_sma_max = 2/(1-b2) - 1; N_sma_t = N_sma_max - 2 t b2^t/(1-b2^t)
    - if N_sma >= 5: step = sqrt((1-b2^t)(N_sma-4)/(N_max-4)(N_sma-2)/N_sma
      * N_max/(N_max-2)) / (1-b1^t); p -= wd*lr*p; p -= step*lr*mu/(sqrt(nu)+eps)
    - elif degenerated_to_sgd: step = 1/(1-b1^t); decay; p -= step*lr*mu
    - else: no parameter update (moments still accumulate).

    Returns the list of parameter values after each step.
    """
    p = np.asarray(params, dtype=np.float64).copy()
    mu = np.zeros_like(p)
    nu = np.zeros_like(p)
    out = []
    n_sma_max = 2.0 / (1.0 - beta2) - 1.0
    for t, g in enumerate(grads_seq, start=1):
        g = np.asarray(g, dtype=np.float64)
        nu = beta2 * nu + (1.0 - beta2) * g * g
        mu = beta1 * mu + (1.0 - beta1) * g
        beta2_t = beta2 ** t
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        if n_sma >= 5.0:
            step_size = (
                np.sqrt(
                    (1.0 - beta2_t)
                    * (n_sma - 4.0) / (n_sma_max - 4.0)
                    * (n_sma - 2.0) / n_sma
                    * n_sma_max / (n_sma_max - 2.0)
                )
                / (1.0 - beta1 ** t)
            )
            if weight_decay != 0.0:
                p = p - weight_decay * lr * p
            p = p - step_size * lr * mu / (np.sqrt(nu) + eps)
        elif degenerated_to_sgd:
            step_size = 1.0 / (1.0 - beta1 ** t)
            if weight_decay != 0.0:
                p = p - weight_decay * lr * p
            p = p - step_size * lr * mu
        out.append(p.copy())
    return out


def _run_jax_trajectory(p0, grads_seq, lr, hyper):
    params = {"w": jnp.asarray(p0, jnp.float32)}
    state = init_radam_state(params)
    traj = []
    for g in grads_seq:
        grads = {"w": jnp.asarray(g, jnp.float32)}
        params, state = radam_update(
            grads, state, params, jnp.float32(lr), lambda path: hyper
        )
        traj.append(np.asarray(params["w"], dtype=np.float64))
    return traj


def _golden_case(hyper, lr=0.01, steps=10, seed=0):
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads_seq = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(steps)]
    ref = radam_reference_numpy(
        p0, grads_seq, lr, hyper.beta1, hyper.beta2, hyper.eps,
        hyper.weight_decay, hyper.degenerated_to_sgd,
    )
    got = _run_jax_trajectory(p0, grads_seq, lr, hyper)
    return ref, got, p0


def test_radam_net_group_matches_reference_math():
    """Net param group: weight_decay=1e-6, eps=1e-8 (run_nerf.py:283)."""
    hyper = RAdamHyper(beta1=0.9, beta2=0.99, eps=1e-8, weight_decay=1e-6)
    ref, got, _ = _golden_case(hyper)
    for t, (r, g) in enumerate(zip(ref, got), start=1):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {t}")


def test_radam_table_group_matches_reference_math():
    """Table param group: eps=1e-15, no weight decay (run_nerf.py:284).

    Tiny-eps exercises the denominator path where sqrt(nu) dominates."""
    hyper = RAdamHyper(beta1=0.9, beta2=0.99, eps=1e-15, weight_decay=0.0)
    ref, got, _ = _golden_case(hyper, seed=1)
    for t, (r, g) in enumerate(zip(ref, got), start=1):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {t}")


def test_radam_rectification_threshold_no_update_before_t6():
    """At beta2=0.99 and degenerated_to_sgd=False, N_sma < 5 for t <= 5 so
    parameters must be bit-identical to their initial values through step 5,
    then move at step 6 (radam.py:73-92: no update branch when step_size=-1)."""
    hyper = RAdamHyper(beta1=0.9, beta2=0.99, eps=1e-8, weight_decay=0.0)
    ref, got, p0 = _golden_case(hyper, seed=2)
    for t in range(5):
        np.testing.assert_array_equal(got[t], p0.astype(np.float64),
                                      err_msg=f"param moved at t={t + 1} < 6")
    assert np.abs(got[5] - p0).max() > 0.0, "no update at t=6 (threshold miss)"
    # and the reference model agrees on both sides of the threshold
    np.testing.assert_allclose(got[5], ref[5], rtol=2e-5, atol=2e-6)


def test_radam_degenerated_to_sgd_branch():
    """degenerated_to_sgd=True takes plain-SGD steps while N_sma < 5
    (radam.py:75-76,88-92)."""
    hyper = RAdamHyper(beta1=0.9, beta2=0.99, eps=1e-8, weight_decay=1e-2,
                       degenerated_to_sgd=True)
    ref, got, p0 = _golden_case(hyper, seed=3, steps=8)
    assert np.abs(got[0] - p0).max() > 0.0, "SGD branch did not update at t=1"
    for t, (r, g) in enumerate(zip(ref, got), start=1):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {t}")


def test_pocketnerf_hyper_fn_group_routing():
    """Leaf paths rooted at 'table' get the embedding group (eps=1e-15,
    wd=0); everything else gets the net group (run_nerf.py:281-285)."""
    import jax

    params = {"table": jnp.zeros((4, 2)), "sigma": {"w0": jnp.zeros((3, 3))}}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, _ in flat:
        h = pocketnerf_hyper_fn(path)
        if path[0].key == "table":
            assert h.eps == 1e-15 and h.weight_decay == 0.0
        else:
            assert h.eps == 1e-8 and h.weight_decay == 1e-6
