"""Config-level lambda_entropy resolution + optimization-collapse
watchdog (round-3 verdict items 2 and 8).

The entropy loss has attractors at ws=0 AND ws=1; with --guidance none
there is no novel-view data term opposing the ws=1 attractor and the
scene collapses to a solid opaque block (docs/TPU_NOTES.md "failure
modes #2"). The default must therefore resolve at the Config layer —
the round-3 CLI-only guard let programmatic users (scripts/quality_ab)
train straight into the attractor for 86 minutes."""

import math

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
