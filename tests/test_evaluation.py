"""Tests for the built-in image-quality metrics (utils/evaluation.py):
PSNR, the from-scratch SSIM, and the GMSD lpips-proxy
(reference: PocketNeRF/evaluation_utils.py:11-141)."""

import numpy as np

from indoor_nerf_tpu.utils.evaluation import (
    ComprehensiveEvaluator,
    gmsd,
    psnr,
    ssim,
)


def _img(rng, h=48, w=48):
    # Smooth structured image (metrics are meaningless on pure noise).
    y, x = np.mgrid[0:h, 0:w] / 16.0
    base = np.stack(
        [0.5 + 0.4 * np.sin(x), 0.5 + 0.4 * np.cos(y),
         0.5 + 0.3 * np.sin(x + y)], axis=-1
    )
    return np.clip(base + 0.02 * rng.normal(size=(h, w, 3)), 0, 1)


def test_psnr_basics(rng):
    img = _img(rng)
    assert psnr(img, img) > 100.0
    assert abs(psnr(img, np.clip(img + 0.1, 0, 1)) - 20.0) < 1.5


def test_ssim_identity_and_monotonicity(rng):
    img = _img(rng)
    assert abs(ssim(img, img) - 1.0) < 1e-9
    s_small = ssim(np.clip(img + 0.02 * rng.normal(size=img.shape), 0, 1), img)
    s_big = ssim(np.clip(img + 0.2 * rng.normal(size=img.shape), 0, 1), img)
    assert 1.0 > s_small > s_big > 0.0


def test_gmsd_identity_and_monotonicity(rng):
    img = _img(rng)
    assert gmsd(img, img) < 1e-12
    d = []
    for amp in (0.02, 0.08, 0.3):
        noisy = np.clip(img + amp * rng.normal(size=img.shape), 0, 1)
        d.append(gmsd(noisy, img))
    assert d[0] < d[1] < d[2], d
    # Structural distortion (blur) registers too.
    blur = img.copy()
    blur[1:-1] = (img[:-2] + img[1:-1] + img[2:]) / 3.0
    assert gmsd(blur, img) > gmsd(img, img)


def test_evaluator_always_reports_third_metric(rng):
    """The third quality metric must never be absent: real LPIPS when the
    pretrained weights exist, GMSD lpips_proxy always (VERDICT item 8)."""
    ev = ComprehensiveEvaluator()
    img, gt = _img(rng), _img(rng)
    m = ev.evaluate_image(img, gt)
    assert set(m) >= {"psnr", "ssim", "lpips_proxy"}
    assert np.isfinite(m["lpips_proxy"])

    summary = ev.evaluate_test_set([img, gt], [gt, gt])
    assert "lpips_proxy_mean" in summary and "lpips_proxy_std" in summary
    # Perfect reconstruction scores 0; the distorted one scores higher.
    per = summary["per_image"]
    assert per[1]["lpips_proxy"] < 1e-12 < per[0]["lpips_proxy"]
