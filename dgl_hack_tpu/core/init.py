"""Feature initializers (reference: python/dgl/init.py base_initializer /
zero_initializer used by Frame lazy rows)."""
from __future__ import annotations

import jax.numpy as jnp


def zero_initializer(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def base_initializer(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
