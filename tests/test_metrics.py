"""utils/metrics.py: PSNR/SSIM correctness and the occupancy-vs-pure
fidelity smoke check behind scripts/fidelity.py."""

import numpy as np


def test_psnr_known_values():
    from makeit3d_tpu.utils.metrics import psnr

    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    # uniform noise of amplitude eps: mse = eps^2 -> psnr = -20 log10 eps
    b = np.clip(a + 0.1, 0, 1.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, np.zeros_like(a)) < psnr(a, a * 0.9)


def test_ssim_known_values():
    from makeit3d_tpu.utils.metrics import ssim

    rng = np.random.default_rng(1)
    a = rng.random((32, 32)).astype(np.float32)
    assert abs(ssim(a, a) - 1.0) < 1e-9
    noisy = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    s = ssim(a, noisy)
    assert 0.0 < s < 0.9
    # gray image pair: structural similarity of constants is 1
    c = np.full((32, 32), 0.5)
    assert abs(ssim(c, c) - 1.0) < 1e-9
