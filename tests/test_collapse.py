"""Config-level lambda_entropy resolution + optimization-collapse
watchdog (round-3 verdict items 2 and 8).

The entropy loss has attractors at ws=0 AND ws=1; with --guidance none
there is no novel-view data term opposing the ws=1 attractor and the
scene collapses to a solid opaque block (docs/TPU_NOTES.md "failure
modes #2"). The default must therefore resolve at the Config layer —
the round-3 CLI-only guard let programmatic users (scripts/quality_ab)
train straight into the attractor for 86 minutes."""

import math

import numpy as np

import pytest

from makeit3d_tpu.config import Config
from makeit3d_tpu.training.trainer import (
    OptimizationCollapseError,
    Trainer,
)


# ---------------------------------------------------------------- config

def test_entropy_default_guided():
    assert Config().lambda_entropy == 1.0


def test_entropy_default_unguided():
    # the regression: programmatic Config(guidance="none") must get the
    # collapse-safe default without going through the CLI
    assert Config(guidance="none").lambda_entropy == 1e-3


def test_entropy_explicit_wins():
    assert Config(guidance="none", lambda_entropy=0.5).lambda_entropy == 0.5
    assert Config(lambda_entropy=0.0).lambda_entropy == 0.0


def test_entropy_json_roundtrip():
    cfg = Config(guidance="none")
    back = Config.from_json(cfg.to_json())
    assert back.lambda_entropy == 1e-3


def test_entropy_cli_default():
    from makeit3d_tpu.main import parse_args

    cfg, _ = parse_args(["--guidance", "none", "--ref_path", "x.png"])
    assert cfg.lambda_entropy == 1e-3
    cfg, _ = parse_args(["--guidance", "none", "--ref_path", "x.png",
                         "--lambda_entropy", "0.7"])
    assert cfg.lambda_entropy == 0.7
    cfg, _ = parse_args(["--ref_path", "x.png"])
    assert cfg.lambda_entropy == 1.0


# ------------------------------------------------------------- watchdog

class _Log:
    def __init__(self):
        self.lines = []

    def log(self, msg):
        self.lines.append(msg)


class _Stub:
    """Minimal Trainer surface for the unbound _check_collapse method."""

    def __init__(self, **cfg_kw):
        self.cfg = Config(guidance="none", **cfg_kw)
        self.ws = _Log()
        self._collapse_streak = 0
        self.global_step = 0


def _drive(stub, ws_mean, n, loss=0.1, is_front=False):
    for _ in range(n):
        stub.global_step += 9
        Trainer._check_collapse(stub, loss, ws_mean, is_front=is_front)


def test_healthy_run_never_trips():
    stub = _Stub()
    _drive(stub, ws_mean=0.42, n=200)
    assert stub._collapse_streak == 0
    assert not stub.ws.lines


def test_pinned_ws_warns_then_aborts():
    stub = _Stub(collapse_warn_intervals=3, collapse_abort_intervals=8)
    _drive(stub, ws_mean=1.0, n=5)
    assert any("collapsed" in l for l in stub.ws.lines)
    with pytest.raises(OptimizationCollapseError):
        _drive(stub, ws_mean=1.0, n=5)


def test_nan_loss_aborts():
    stub = _Stub(collapse_abort_intervals=4)
    with pytest.raises(OptimizationCollapseError):
        _drive(stub, ws_mean=0.3, n=10, loss=math.nan)


def test_recovery_resets_streak():
    stub = _Stub(collapse_abort_intervals=6)
    _drive(stub, ws_mean=1.0, n=5)
    _drive(stub, ws_mean=0.5, n=1)   # one healthy interval resets
    assert stub._collapse_streak == 0
    _drive(stub, ws_mean=1.0, n=5)   # needs the full streak again


def test_front_steps_do_not_reset_streak():
    # the round-4 ab_hashgrid pattern: novel intervals pinned at 1.0
    # interleaved with masked-front intervals at ws≈0.51 every 4th log
    # — the front dips must not clear the streak, or the watchdog can
    # never fire on exactly the failure it was built for
    stub = _Stub(collapse_abort_intervals=8, collapse_warn_intervals=0)
    with pytest.raises(OptimizationCollapseError):
        for _round in range(4):
            _drive(stub, ws_mean=1.0, n=3)
            _drive(stub, ws_mean=0.51, n=1, is_front=True)


def test_front_nan_still_counts_dead():
    stub = _Stub(collapse_abort_intervals=4)
    with pytest.raises(OptimizationCollapseError):
        _drive(stub, ws_mean=0.5, n=10, loss=math.nan, is_front=True)


def test_disable_knobs():
    stub = _Stub(collapse_ws_threshold=0.0)
    _drive(stub, ws_mean=1.0, n=100, loss=math.nan)
    stub = _Stub(collapse_abort_intervals=0, collapse_warn_intervals=2)
    _drive(stub, ws_mean=1.0, n=100)   # warns but never raises
    assert any("collapsed" in l for l in stub.ws.lines)


class TestSigmaCap:
    """Density-saturation cap (Config.lambda_sigma_cap): saturated
    regions get a constant pull-down where alpha gradients vanished."""

    def test_config_resolution(self):
        from makeit3d_tpu.config import Config

        assert Config(guidance="none").lambda_sigma_cap == 0.1
        assert Config(guidance="sd").lambda_sigma_cap == 0.0
        assert Config(guidance="none",
                      lambda_sigma_cap=0.5).lambda_sigma_cap == 0.5
        assert Config(guidance="sd",
                      lambda_sigma_cap=0.2).lambda_sigma_cap == 0.2

    def test_loss_value_and_constant_gradient(self):
        import jax
        import jax.numpy as jnp

        from makeit3d_tpu.ops.activation import trunc_exp

        tau = 9.0

        def cap_loss(v):
            sigma = trunc_exp(v)
            return jnp.sum(jnp.maximum(
                jnp.log(jnp.maximum(sigma, 1e-12)) - tau, 0.0))

        # below the cap: zero loss, zero gradient
        v = jnp.asarray([2.0, 8.9])
        assert float(cap_loss(v)) == 0.0
        assert np.allclose(np.asarray(jax.grad(cap_loss)(v)), 0.0)

        # above the cap (including the trunc_exp saturation zone v>15):
        # gradient w.r.t. the raw logit is EXACTLY 1 — the pull-down
        # never vanishes, unlike dt*exp(-sigma*dt)
        v = jnp.asarray([10.0, 14.0, 20.0, 40.0])
        g = np.asarray(jax.grad(cap_loss)(v))
        np.testing.assert_allclose(g, [1.0, 1.0, 1.0, 1.0], atol=1e-5)
        # saturation: log(trunc_exp(v)) clamps at 15, so the LOSS value
        # plateaus at 15-tau, but the gradient stays 1 via the custom
        # trunc_exp vjp (exp(min(v, 15)))
        assert float(cap_loss(jnp.asarray([40.0]))) == pytest.approx(6.0)

    def test_step_reports_and_reduces_saturation(self, tmp_path):
        """A train step on a saturated-density field reports
        loss_sigma_cap > 0 and the update reduces it."""
        import jax.numpy as jnp

        from makeit3d_tpu.config import Config

        # reuse the collapse-test mini trainer pattern if available;
        # otherwise build directly
        from makeit3d_tpu.training.trainer import Trainer

        cfg = Config(h=16, w=16, H=16, W=16, max_steps=64, grid_size=32,
                     train_samples_per_ray=16, eval_samples_per_ray=16,
                     backbone="vanilla", guidance="none",
                     lambda_smooth=0.0, iters=4, max_ray_batch=256,
                     workspace=str(tmp_path))
        assert cfg.lambda_sigma_cap == 0.1
        rgba = np.zeros((1, 512, 512, 4), np.float32)
        rgba[0, 160:352, 160:352, :] = 0.8
        tr = Trainer(cfg, ref_rgba=rgba,
                     ref_depth=np.full((512, 512), 0.5, np.float32),
                     ref_mask=rgba[0, :, :, 3] < 0.5,
                     workspace=cfg.workspace, use_checkpoint="scratch")
        from makeit3d_tpu.cameras import ViewSampler

        view = ViewSampler(cfg, type="train", H=16, W=16, size=8,
                           seed=0).get(1)
        m, _aux = tr.step(view)
        assert "loss_sigma_cap" in m
        assert np.isfinite(float(m["loss_sigma_cap"]))
