"""Adan optimizer (Adaptive Nesterov Momentum) as an optax transformation.

reference: optimizer.py:23-325 (the pytorch variant of arXiv:2208.06677).
State per parameter: three EMAs (gradient m_t, gradient-difference d_t,
squared Nesterov-corrected gradient n_t) plus the previous gradient.
Supports the reference's global grad-norm clipping (max_grad_norm) and
decoupled *proximal* weight decay (param /= 1 + lr*wd after the step).

Per-parameter-group learning rates (hash encoder x10, reference:
nerf/network_tcnn.py:195-205) are handled by `lr_scale_fn` mapping a
parameter path to a multiplier.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


class AdanState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates        # m_t
    exp_avg_diff: optax.Updates   # d_t
    exp_avg_sq: optax.Updates     # n_t
    prev_grad: optax.Updates


def _as_schedule(lr: Schedule):
    if callable(lr):
        return lr
    return lambda count: jnp.asarray(lr, jnp.float32)


def adan(
    learning_rate: Schedule = 1e-3,
    betas=(0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    no_prox: bool = False,
    lr_scale_fn: Optional[Callable[[tuple], float]] = None,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas
    lr_fn = _as_schedule(learning_rate)

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=zeros,
            exp_avg_diff=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        assert params is not None, "adan requires params (proximal decay)"
        count = state.count + 1
        lr = lr_fn(count)

        # global grad-norm clipping (reference: optimizer.py:110-129)
        if max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = jax.tree.map(lambda g: g * clip, grads)

        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)
        bc3_sqrt = jnp.sqrt(1.0 - b3**count.astype(jnp.float32))

        is_first = count == 1

        def upd(g, m, d, n, pg, p, path):
            # at step 1 the reference seeds prev_grad with the current grad
            # so diff_1 = 0 (optimizer.py:164-166)
            pg = jnp.where(is_first, g, pg)
            diff = g - pg
            m = b1 * m + (1 - b1) * g
            d = b2 * d + (1 - b2) * diff
            u = g + b2 * diff
            n = b3 * n + (1 - b3) * u * u

            scale = lr_scale_fn(path) if lr_scale_fn is not None else 1.0
            glr = lr * scale
            denom = jnp.sqrt(n) / bc3_sqrt + eps
            step = glr / bc1 * m / denom + glr * b2 / bc2 * d / denom
            if no_prox:
                new_p = p * (1 - glr * weight_decay) - step
            else:
                new_p = (p - step) / (1 + glr * weight_decay)
            return new_p - p, m, d, n, g

        flat_g, tree = jax.tree_util.tree_flatten_with_path(grads)
        paths = [p for p, _ in flat_g]
        gs = [g for _, g in flat_g]
        ms = jax.tree_util.tree_leaves(state.exp_avg)
        ds = jax.tree_util.tree_leaves(state.exp_avg_diff)
        ns = jax.tree_util.tree_leaves(state.exp_avg_sq)
        pgs = jax.tree_util.tree_leaves(state.prev_grad)
        ps = jax.tree_util.tree_leaves(params)

        outs = [
            upd(g, m, d, n, pg, p, path)
            for path, g, m, d, n, pg, p in zip(paths, gs, ms, ds, ns, pgs, ps)
        ]
        unflatten = lambda vals: jax.tree_util.tree_unflatten(tree, vals)
        updates = unflatten([o[0] for o in outs])
        new_state = AdanState(
            count=count,
            exp_avg=unflatten([o[1] for o in outs]),
            exp_avg_diff=unflatten([o[2] for o in outs]),
            exp_avg_sq=unflatten([o[3] for o in outs]),
            prev_grad=unflatten([o[4] for o in outs]),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _path_contains(path, token: str) -> bool:
    for p in path:
        key = getattr(p, "key", getattr(p, "name", None))
        if key is not None and token in str(key):
            return True
    return False


def make_optimizer(cfg, schedule: Optional[Schedule] = None) -> optax.GradientTransformation:
    """Optimizer factory (reference: main.py:129-134).

    adan: lr x5, wd 2e-5, max_grad_norm 5, encoder params at lr x10
    (reference: network_tcnn.py:195-205). adam: betas (0.9, 0.99),
    eps 1e-15.
    """
    lr_scale = lambda path: 10.0 if _path_contains(path, "hash_table") else 1.0
    if cfg.optim == "adan":
        lr = schedule if schedule is not None else 5 * cfg.lr
        opt = adan(
            learning_rate=lr,
            eps=1e-8,
            weight_decay=2e-5,
            max_grad_norm=5.0,
            lr_scale_fn=lr_scale,
        )
    else:
        lr = schedule if schedule is not None else cfg.lr
        opt = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
    # Skip non-finite steps instead of poisoning params — the functional
    # equivalent of the reference's AMP GradScaler behavior
    # (nerf/utils.py:309,983-986: scaler.step skips on inf/nan grads).
    return optax.apply_if_finite(opt, max_consecutive_errors=10000)


def make_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR schedule factory (reference: main.py:136-144).

    vanilla/fourier (MLP fields): linear warmup + cosine to min_lr;
    hashgrid: constant.
    Returns a multiplier-applied schedule (absolute LR).
    """
    base = 5 * cfg.lr if cfg.optim == "adan" else cfg.lr
    if cfg.backbone in ("vanilla", "fourier"):
        warm = max(cfg.warm_iters, 1)

        def sched(count):
            it = count.astype(jnp.float32)
            warmup = it / warm
            cos = 0.5 * (
                jnp.cos((it - warm) / max(cfg.iters - warm, 1) * jnp.pi) + 1.0
            )
            factor = jnp.where(it <= warm, warmup, jnp.maximum(cos, cfg.min_lr / cfg.lr))
            return base * factor

        return sched
    return lambda count: jnp.asarray(base, jnp.float32)
