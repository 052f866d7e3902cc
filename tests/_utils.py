"""Shared test helpers."""

import numpy as np

import jax
import jax.numpy as jnp


def fast_init(model, *args, seed=0, **kwargs):
    """Cheap variables init: eval_shape for the tree, numpy RNG for values.

    Avoids compiling the full flax init program (which costs ~70s per model on
    the CPU test runner); numerical init quality is irrelevant for these tests.
    """
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *args, **kwargs))
    rng = np.random.default_rng(seed)

    def fill(s):
        return jnp.asarray(rng.normal(scale=0.05, size=s.shape), s.dtype)

    return jax.tree.map(fill, shapes)
