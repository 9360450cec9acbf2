"""Elastic worker-fault recovery (training/trainer.py): inject a fault
mid-epoch and check the loop restores the host snapshot, re-rolls the
compile salt, and finishes the epoch. SURVEY.md §5.3: the reference has
no failure handling at all — this subsystem is TPU-deployment-native."""

import numpy as np
import pytest

import jax

from makeit3d_tpu.cameras import ViewSampler
from makeit3d_tpu.config import Config
from makeit3d_tpu.training.trainer import Trainer
from makeit3d_tpu.utils.watchdog import DeviceHangError


@pytest.fixture()
def tiny_cfg(tmp_path):
    return Config(
        h=24, w=24, max_steps=64, train_samples_per_ray=16,
        eval_samples_per_ray=16, grid_size=16, hash_levels=4,
        log2_hashmap_size=10, desired_resolution=64, guidance="none",
        workspace=str(tmp_path / "ws"), albedo_iters=4,
        reroll_wait_s=0.0, snapshot_interval=4,
    )


class _Boom:
    """Wraps a train-step callable; raises on call #`when`, else passes
    through."""

    def __init__(self, fn, when, exc):
        self.fn, self.when, self.exc = fn, when, exc
        self.calls = 0

    def __call__(self, *a, **k):
        self.calls += 1
        if self.calls == self.when:
            raise self.exc
        return self.fn(*a, **k)


@pytest.mark.parametrize("exc", [
    jax.errors.JaxRuntimeError("injected worker fault"),
    DeviceHangError("injected hang"),
])
def test_epoch_recovers_from_fault(tiny_cfg, exc):
    tr = Trainer(tiny_cfg, workspace=tiny_cfg.workspace,
                 use_checkpoint="scratch")
    sampler = ViewSampler(tiny_cfg, type="train", H=tiny_cfg.h,
                          W=tiny_cfg.w, size=12, seed=0)
    key = (True, False, False)  # the front program (front views sample first)
    tr._train_step[key] = _Boom(tr._train_step[key], when=3, exc=exc)
    salt_before = tr._compile_salt

    tr.train_one_epoch(sampler)

    # the epoch completed all 12 sampled views despite the fault, and
    # the rebuilt jits replaced the boobytrapped one
    assert tr._compile_salt == salt_before + 1
    assert not isinstance(tr._train_step[key], _Boom)
    assert tr.global_step >= 12
    # training state is live and finite after the rollback
    assert np.isfinite(float(jax.tree.leaves(tr.params)[0].sum()))


def test_fault_exhausts_rerolls(tiny_cfg):
    cfg = tiny_cfg.replace(max_compile_rerolls=1)
    tr = Trainer(cfg, workspace=cfg.workspace, use_checkpoint="scratch")
    sampler = ViewSampler(cfg, type="train", H=cfg.h, W=cfg.w,
                          size=8, seed=0)

    def always_boom(*a, **k):
        raise jax.errors.JaxRuntimeError("permanent fault")

    # both albedo-phase programs permanently broken -> must raise after
    # max_compile_rerolls (each _build_jits rebuild is re-broken here)
    def rebreak():
        tr._train_step[(True, False, False)] = always_boom
        tr._train_step[(False, False, False)] = always_boom

    orig_build = tr._build_jits

    def build_and_break():
        orig_build()
        rebreak()

    tr._build_jits = build_and_break
    rebreak()
    with pytest.raises(jax.errors.JaxRuntimeError):
        tr.train_one_epoch(sampler)


def test_checkpoint_tolerant_optimizer_mismatch(tiny_cfg):
    """A checkpoint saved with a different optimizer-state structure must
    still restore model weights (reference: utils.py:1124-1186 tolerant
    per-part load)."""
    cfg_adam = tiny_cfg.replace(optim="adam")
    tr = Trainer(cfg_adam, workspace=cfg_adam.workspace,
                 use_checkpoint="scratch")
    sampler = ViewSampler(cfg_adam, type="train", H=cfg_adam.h,
                          W=cfg_adam.w, size=4, seed=0)
    tr.train_one_epoch(sampler)
    tr.save_checkpoint("mismatch_test")

    cfg_adan = tiny_cfg.replace(optim="adan")
    tr2 = Trainer(cfg_adan, workspace=cfg_adan.workspace,
                  use_checkpoint="latest")
    assert tr2.global_step == tr.global_step
    p1 = np.concatenate([np.ravel(np.asarray(x))
                         for x in jax.tree.leaves(tr.params)])
    p2 = np.concatenate([np.ravel(np.asarray(x))
                         for x in jax.tree.leaves(tr2.params)])
    np.testing.assert_allclose(p1, p2)
