"""Multi-host rank-gating (docs/MULTIHOST.md §2): host 0 owns all
filesystem side effects; every other host computes silently.

The reference is single-process (SURVEY.md §2.3) so there is no
reference behavior to mirror — the contract under test is this repo's
own policy: a non-primary Workspace makes NO filesystem writes (not
even directories: the workspace may live on a shared FS), and the
Trainer/Refine write paths early-return off the same flag.
"""

import os

import pytest

from makeit3d_tpu.config import Config
from makeit3d_tpu.utils import workspace as wsmod
from makeit3d_tpu.utils.workspace import Workspace


def test_primary_workspace_writes(tmp_path):
    ws = Workspace(str(tmp_path / "w"), primary=True)
    ws.log("hello")
    ws.scalar("t", 1.0, 1)
    ws.dump_settings(Config(guidance="none"))
    ws.close()
    assert os.path.exists(ws.log_path)
    assert os.path.exists(ws.metrics_path)
    assert os.path.exists(os.path.join(ws.root, "setting.txt"))
    assert os.path.isdir(ws.ckpt_dir) and os.path.isdir(ws.train_dir)


def test_nonprimary_workspace_writes_nothing(tmp_path, capsys):
    root = tmp_path / "w"
    ws = Workspace(str(root), primary=False)
    ws.log("must not appear")
    ws.scalar("t", 1.0, 1)
    ws.dump_settings(Config(guidance="none"))
    ws.close()
    # no files, no dirs, no stdout
    assert not root.exists()
    assert capsys.readouterr().out == ""


def test_default_primary_resolution(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert wsmod.default_primary() is True
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert wsmod.default_primary() is False


class _GatedStub:
    """Minimal Trainer surface for the unbound gated methods."""

    def __init__(self):
        self.ws = Workspace.__new__(Workspace)
        self.ws.primary = False


def test_trainer_checkpoint_gated():
    from makeit3d_tpu.training.trainer import Trainer

    # on a non-primary host the method must return before touching any
    # state beyond ws.primary — the stub has nothing else to offer
    assert Trainer.save_checkpoint(_GatedStub()) is None
    assert Trainer.save_checkpoint(_GatedStub(), best=True) is None


def test_trainer_test_and_mesh_gated():
    from makeit3d_tpu.training.trainer import Trainer

    assert Trainer.test(_GatedStub(), sampler=None) is None
    assert Trainer.save_mesh(_GatedStub()) is None


def test_refine_stage_resolves_primary(monkeypatch, tmp_path):
    import jax

    from makeit3d_tpu.training.refine import RefineStage

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    stage = RefineStage(Config(guidance="none"), guidance=None,
                        workspace=str(tmp_path))
    assert stage.primary is False
