"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA-fallback twin elsewhere in ops/; the Pallas
versions are opt-in (config flags / function arguments) and run in
interpreter mode on CPU so the same tests cover both backends.
"""

from __future__ import annotations

import jax


def interpret_mode() -> bool:
    """Pallas kernels compile natively only on TPU; interpret elsewhere."""
    return jax.default_backend() != "tpu"
