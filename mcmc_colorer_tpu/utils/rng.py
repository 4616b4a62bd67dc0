"""Randomness: a single `jax.random` key tree.

The reference mixes three RNGs (time-seeded C ``rand()``, per-repetition
``std::default_random_engine``, one curandState per node — SURVEY §9.8).
Here one root key is split deterministically per (repetition, chain,
iteration, purpose); exact sequence parity with curand is impossible and not
required — distributional parity is (SURVEY §10 hard part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(jnp.uint32(seed))


def for_repetition(key: jax.Array, repetition: int) -> jax.Array:
    """Mirrors the reference's ``seed + repetition`` per-run engine
    (main.cu:171) as a fold."""
    return jax.random.fold_in(key, repetition)


def for_chain(key: jax.Array, chain: jax.Array | int) -> jax.Array:
    return jax.random.fold_in(key, chain)


def for_iteration(key: jax.Array, iteration: jax.Array | int) -> jax.Array:
    return jax.random.fold_in(key, iteration)
