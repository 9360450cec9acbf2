"""utils/watchdog: deadline-bounded device calls (see its docstring for
the dead-RPC failure mode it guards against)."""

import time

import pytest

from makeit3d_tpu.utils.watchdog import (
    DeviceHangError,
    block_until_ready_timeout,
    call_with_timeout,
)


def test_returns_value():
    assert call_with_timeout(lambda: 41 + 1, 5.0) == 42


def test_propagates_exception():
    with pytest.raises(ValueError, match="boom"):
        call_with_timeout(lambda: (_ for _ in ()).throw(ValueError("boom")),
                          5.0)


def test_times_out():
    t0 = time.time()
    with pytest.raises(DeviceHangError):
        call_with_timeout(lambda: time.sleep(30), 0.2)
    assert time.time() - t0 < 5.0


def test_block_until_ready_passthrough():
    import jax.numpy as jnp

    block_until_ready_timeout(jnp.ones((4,)), 30.0)
