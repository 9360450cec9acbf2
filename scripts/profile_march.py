"""Micro-decomposition of march_rays at 128^2 on the real chip.

march_rays is 263 ms of the 351 ms albedo step (scripts/profile_step.py,
2026-08-17). This times its internal phases as separate programs with
fetch-based timing to find which one owns the wall-clock:

  posgen      lattice t + positions (pure vector math, [N,K,3])
  occ_gather  occupancy_lookup on [N,K] points (8.4M random gathers)
  cumsum      cumsum over K per ray
  searchsort  vmapped searchsorted (S=96 queries into K=512 per ray)
  count_mat   comparison-matrix alternative to searchsorted
  take        take_along_axis compaction gathers
  full        march_rays end to end

Usage: python scripts/profile_march.py [h] [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, n, fetch):
    out = fn(0)
    _ = float(np.asarray(fetch(out)))
    t0 = time.time()
    for i in range(n):
        out = fn(i + 1)
    _ = float(np.asarray(fetch(out)))
    dt = (time.time() - t0) / n
    print(f"  {name:12s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from makeit3d_tpu.cameras import ViewSampler
    from makeit3d_tpu.config import Config
    from makeit3d_tpu.ops.grid import init_density_grid, occupancy_lookup
    from makeit3d_tpu.ops.marching import march_rays, near_far_from_aabb

    cfg = Config(h=h, w=h)
    K, S = cfg.max_steps, cfg.train_samples_per_ray
    bound = cfg.bound

    grid = init_density_grid(cfg.cascade, cfg.grid_size)
    G = cfg.grid_size
    coords = (np.mgrid[0:G, 0:G, 0:G].astype(np.float32) + 0.5) / G * 2 - 1
    sphere = (np.sqrt((coords**2).sum(0)) < 0.6).astype(np.uint8)
    occ = jnp.asarray(sphere[None].repeat(cfg.cascade, 0))

    sampler = ViewSampler(cfg, type="train", H=h, W=h, size=16, seed=0)
    view = sampler.get(1)
    rays_o = jnp.asarray(view.rays_o.reshape(-1, 3))
    rays_d = jnp.asarray(view.rays_d.reshape(-1, 3))
    N = rays_o.shape[0]
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = jax.jit(near_far_from_aabb)(rays_o, rays_d, aabb,
                                              cfg.min_near)
    import math
    dt_step = 2.0 * math.sqrt(3.0) / K
    print(f"[march profile] h={h} N={N} K={K} S={S} NK={N * K / 1e6:.1f}M",
          flush=True)
    key = jax.random.PRNGKey(0)

    # posgen
    @jax.jit
    def posgen(noise):
        k = jnp.arange(K, dtype=jnp.float32)[None, :]
        t = nears[:, None] + (k + noise) * dt_step
        pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        return jnp.clip(pos, -bound, bound)

    timed("posgen", lambda i: posgen(jax.random.uniform(key, (N, 1))), n,
          lambda p: jnp.sum(p[0, 0]))

    pos0 = posgen(jnp.zeros((N, 1)))

    # occupancy gather
    @jax.jit
    def occg(pos):
        return jnp.sum(occupancy_lookup(occ, pos, bound).astype(jnp.int32))

    timed("occ_gather", lambda i: occg(pos0 + 1e-6 * i), n, lambda x: x)

    # cumsum
    mask0 = occupancy_lookup(occ, pos0, bound)

    @jax.jit
    def cums(m):
        return jnp.cumsum(m.astype(jnp.int32), axis=-1)

    timed("cumsum", lambda i: cums(mask0 != (i % 2 == 99)), n,
          lambda c: jnp.sum(c[:, -1]))

    cum0 = cums(mask0)
    want = jnp.arange(1, S + 1, dtype=jnp.int32)

    # searchsorted (current implementation)
    @jax.jit
    def ss(cum):
        return jax.vmap(
            lambda c: jnp.searchsorted(c, want, side="left"))(cum)

    timed("searchsort", lambda i: ss(cum0 + (i % 2) * 0), n,
          lambda s_: jnp.sum(s_))

    # comparison-count alternative: slot_idx[s] = #k with cum[k] < s+1
    @jax.jit
    def cmat(cum):
        lt = cum[:, :, None] < want[None, None, :]  # [N, K, S]
        return jnp.sum(lt.astype(jnp.int32), axis=1)

    timed("count_mat", lambda i: cmat(cum0 + (i % 2) * 0), n,
          lambda s_: jnp.sum(s_))

    # take_along_axis compaction
    slot0 = ss(cum0)

    @jax.jit
    def tk(slot):
        k = jnp.arange(K, dtype=jnp.float32)[None, :]
        t = nears[:, None] + k * dt_step
        t_s = jnp.take_along_axis(t, jnp.minimum(slot, K - 1), axis=-1)
        xyzs = rays_o[:, None, :] + rays_d[:, None, :] * t_s[..., None]
        return jnp.sum(xyzs)

    timed("take", lambda i: tk(slot0 + (i % 2) * 0), n, lambda x: x)

    # full march
    @jax.jit
    def full(k_):
        m = march_rays(rays_o, rays_d, occ, bound, nears, fars,
                       max_steps=K, n_samples=S, perturb=True, key=k_)
        return jnp.sum(m.ts)

    timed("full", lambda i: full(jax.random.fold_in(key, i)), n, lambda x: x)


if __name__ == "__main__":
    main()
