"""Device-sync watchdog.

The axon relay can lose a TPU worker in a way that never surfaces as an
error: a `block_until_ready` on an in-flight computation then blocks
forever (observed 2026-08-16: a training run sat in a dead RPC for 40+
minutes with zero CPU). JAX's blocking calls run inside C++ and cannot
be interrupted from the calling thread, so the only portable escape is
to do the blocking in a daemon thread and give up waiting after a
timeout — the zombie thread leaks (one per hang) but the driver thread
regains control and can run the elastic recovery path
(training.trainer.Trainer._recover_from_fault).

No reference equivalent (SURVEY.md §5.3: the reference has no failure
detection at all).
"""

from __future__ import annotations

import threading
from typing import Any


class DeviceHangError(RuntimeError):
    """A device call exceeded its deadline (worker presumed lost)."""


def call_with_timeout(fn, timeout_s: float):
    """Run fn() in a daemon thread; raise DeviceHangError after
    `timeout_s` seconds instead of blocking forever.

    On timeout the underlying device work is NOT cancelled (impossible
    through PJRT from here); the blocking daemon thread is abandoned.
    Callers should treat the device state as lost and restore from a
    host snapshot. Exceptions from fn propagate to the caller.
    """
    done = threading.Event()
    out: list = []
    err: list = []

    def _run():
        try:
            out.append(fn())
        except BaseException as e:  # surface worker faults to the caller
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        raise DeviceHangError(
            f"device call did not complete within {timeout_s:.0f}s"
        )
    if err:
        raise err[0]
    return out[0]


def block_until_ready_timeout(tree: Any, timeout_s: float) -> None:
    """jax.block_until_ready(tree) with a DeviceHangError deadline."""
    import jax

    call_with_timeout(lambda: jax.block_until_ready(tree), timeout_s)
