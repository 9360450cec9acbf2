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


def test_lpips_distance_properties():
    """LPIPS (models/vgg.py): zero at identity, positive and
    monotone in perturbation size, symmetric-ish."""
    import jax.numpy as jnp

    from makeit3d_tpu.models.vgg import LPIPS

    lp = LPIPS(seed=0)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    noise = rng.normal(0, 1, (64, 64, 3)).astype(np.float32)
    b_small = jnp.clip(a + 0.05 * noise, 0, 1)
    b_large = jnp.clip(a + 0.4 * noise, 0, 1)

    assert float(lp(a, a)) < 1e-10
    d_small, d_large = float(lp(a, b_small)), float(lp(a, b_large))
    assert 0 < d_small < d_large
    np.testing.assert_allclose(float(lp(b_large, a)), d_large, rtol=1e-5)


def test_lpips_loads_lin_calibration(tmp_path):
    """A torch lpips checkpoint's per-channel lin weights load and
    change the distance."""
    import jax.numpy as jnp
    import torch

    from makeit3d_tpu.models.vgg import LPIPS, VGG19Features, _CFG

    # channel count at each tap = last conv width of each block
    widths = [64, 128, 256, 512, 512]
    sd = {f"lin{l}.model.1.weight":
          torch.rand(1, w, 1, 1) * 0.1 for l, w in enumerate(widths)}
    p = tmp_path / "lin.pth"
    torch.save(sd, str(p))

    lp = LPIPS(lin_weights_path=str(p), seed=0)
    assert lp.lin is not None and len(lp.lin) == 5
    assert [w.shape[0] for w in lp.lin] == widths

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    lp0 = LPIPS(seed=0)
    assert float(lp(a, b)) > 0
    assert abs(float(lp(a, b)) - float(lp0(a, b))) > 1e-8
