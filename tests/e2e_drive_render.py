"""Drive the makeit3d_tpu library surface end-to-end on CPU:
field init -> occupancy grid update -> march -> composite -> PNG.
The field is freshly initialized, so the only structure is the Gaussian
density blob at the origin (blob_density=5, radius=0.1): the render
should show a small bright-ish blob centered in the frame.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax, jax.numpy as jnp
from PIL import Image

from makeit3d_tpu import Config
from makeit3d_tpu.cameras import ViewSampler
from makeit3d_tpu.models.field import make_field
from makeit3d_tpu.models.renderer import RenderSettings, render_occupancy, render_pure
from makeit3d_tpu.ops.grid import init_density_grid, update_density_grid

cfg = Config(backbone="hashgrid", max_steps=256, train_samples_per_ray=64,
             eval_samples_per_ray=64, blob_density=10.0, blob_radius=0.1, fov=60.0)
field = make_field(cfg)
key = jax.random.PRNGKey(0)
variables = field.init(key, jnp.zeros((8, 3)), jnp.zeros((8, 3)))
print("param leaves:", len(jax.tree.leaves(variables)))

# occupancy grid maintenance from the live field
grid = init_density_grid(cfg.cascade, grid_size=64, occupied=False)
density_fn = lambda x: field.apply(variables, x, method="density")["sigma"]
grid = jax.jit(lambda g, k: update_density_grid(g, density_fn, k, cfg.bound, cfg.density_thresh))(grid, key)
occ_frac = float(jnp.mean(grid.occ.astype(jnp.float32)))
print(f"mean_density={float(grid.mean_density):.4f} occupied_frac={occ_frac:.4f}")

# a frontal camera view (the real camera sampler)
views = ViewSampler(cfg, type="train", H=128, W=128, size=100, seed=0)
batch = views.get(0)  # index 0 -> exact front view
print("is_front:", batch.is_front, "is_large:", batch.is_large)

settings = RenderSettings.from_config(cfg, training=False).__class__(
    bound=cfg.bound, min_near=cfg.min_near, max_steps=256, n_samples=64,
    compute_smooth=False)
rays_o = jnp.asarray(batch.rays_o.reshape(-1, 3))
rays_d = jnp.asarray(batch.rays_d.reshape(-1, 3))

out = jax.jit(lambda v, g, k: render_occupancy(
    field, v, g, rays_o, rays_d, settings, k, training=False,
    bg_color=1.0, perturb=False))(variables, grid, key)
img = np.asarray(out["image"]).reshape(128, 128, 3)
ws = np.asarray(out["weights_sum"]).reshape(128, 128)
depth = np.asarray(out["depth"]).reshape(128, 128)
print(f"image range [{img.min():.3f}, {img.max():.3f}]  ws max {ws.max():.3f}")
print(f"center ws {ws[60:68,60:68].mean():.3f} corner ws {ws[:8,:8].mean():.4f}")
print(f"depth center {depth[64,64]:.3f} corner {depth[0,0]:.3f}")
Image.fromarray((np.clip(img,0,1)*255).astype(np.uint8)).save("/tmp/render_occ.png")
Image.fromarray((np.clip(ws,0,1)*255).astype(np.uint8)).save("/tmp/render_ws.png")

# oracle cross-check: pure uniform+PDF path on same rays
pure = jax.jit(lambda v, k: render_pure(
    field, v, rays_o, rays_d, settings, k, training=False,
    bg_color=1.0, perturb=False))(variables, key)
img_p = np.asarray(pure["image"]).reshape(128, 128, 3)
ws_p = np.asarray(pure["weights_sum"]).reshape(128, 128)
Image.fromarray((np.clip(img_p,0,1)*255).astype(np.uint8)).save("/tmp/render_pure.png")
# compare only where the field is decisively occupied (both paths opaque):
# on a random-init field the pure path also integrates sub-threshold 'fog'
# that the occupancy path culls by design (sigma<density_thresh).
core = ws > 0.99
diff = np.abs(img - img_p)[core].mean()
print(f"occ-vs-pure |diff| on opaque core ({core.sum()} px) = {diff:.4f}")
print(f"pure ws max {ws_p.max():.3f}, pure corner ws {ws_p[:8,:8].mean():.3f} (fog, expected)")
assert ws[60:68,60:68].mean() > 0.5, "blob not opaque at center"
assert ws[:8,:8].mean() < 0.05, "corners should be empty"
assert core.sum() > 100
assert diff < 0.02, "occupancy path disagrees with oracle on the object"
print("OK")
