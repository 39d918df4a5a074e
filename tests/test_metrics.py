"""SSIM/PSNR metric correctness (theora_tpu/metrics.py)."""
import numpy as np

from theora_tpu.metrics import (
    _gaussian_kernel,
    clip_luma_psnr,
    clip_luma_ssim,
    psnr,
    ssim,
)


def test_ssim_identity_and_bounds():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 256, (64, 80)).astype(np.uint8)
    assert ssim(a, a) == 1.0
    b = np.clip(a.astype(int) + rng.randint(-40, 41, a.shape), 0, 255)
    s = ssim(a, b.astype(np.uint8))
    assert 0.0 < s < 1.0
    # More distortion => lower SSIM.
    c = np.clip(a.astype(int) + rng.randint(-90, 91, a.shape), 0, 255)
    assert ssim(a, c.astype(np.uint8)) < s


def test_ssim_matches_naive_windowed():
    """The separable/vectorized SSIM must equal the direct 11x11
    Gaussian-window computation (Wang et al. 2004 settings)."""
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (24, 30)).astype(np.float64)
    b = np.clip(a + rng.randint(-30, 31, a.shape), 0, 255)
    g1 = _gaussian_kernel()
    g2 = np.outer(g1, g1)
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    vals = []
    for i in range(a.shape[0] - 10):
        for j in range(a.shape[1] - 10):
            wa = a[i : i + 11, j : j + 11]
            wb = b[i : i + 11, j : j + 11]
            mua = (g2 * wa).sum()
            mub = (g2 * wb).sum()
            va = (g2 * wa * wa).sum() - mua * mua
            vb = (g2 * wb * wb).sum() - mub * mub
            cab = (g2 * wa * wb).sum() - mua * mub
            vals.append(
                ((2 * mua * mub + c1) * (2 * cab + c2))
                / ((mua * mua + mub * mub + c1) * (va + vb + c2))
            )
    assert abs(float(np.mean(vals)) - ssim(a, b)) < 1e-12


def test_psnr_and_clip_helpers():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] ^= 255
    assert psnr(a, b) < 60
    fa = [[a, a, a], [b, b, b]]
    fb = [[a, a, a], [a, a, a]]
    assert clip_luma_psnr(fa, fa) == float("inf")
    assert clip_luma_psnr(fa, fb) < 60
    assert clip_luma_ssim(fa, fa) == 1.0
    assert clip_luma_ssim(fa, fb) < 1.0
