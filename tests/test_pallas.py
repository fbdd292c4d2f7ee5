"""Pallas kernels in interpret mode (CPU); compiled-mode correctness runs on
hardware via bench/tpu smoke scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evstore_tpu.ops.interaction import dot_interaction
from evstore_tpu.ops.pallas_gather import (gather_rows,
                                           gather_rows_dequant_int8,
                                           gather_rows_dequant_int8_ref,
                                           gather_rows_ref)
from evstore_tpu.ops.pallas_interaction import dot_interaction_pallas


def test_gather_rows_interpret(rng):
    table = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 64, 32), jnp.int32)
    out = gather_rows(table, idx, tile_b=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(gather_rows_ref(table, idx)))


def test_gather_rows_duplicate_indices(rng):
    table = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
    idx = jnp.asarray([3, 3, 3, 3, 0, 0, 7, 7], jnp.int32)
    out = gather_rows(table, idx, tile_b=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(table)[np.asarray(idx)])


def test_gather_dequant_int8_interpret(rng):
    table = rng.integers(0, 255, (32, 128)).astype(np.uint8)
    idx = jnp.asarray(rng.integers(0, 32, 16), jnp.int32)
    out = gather_rows_dequant_int8(jnp.asarray(table), idx, tile_b=16,
                                   interpret=True)
    expect = gather_rows_dequant_int8_ref(jnp.asarray(table), idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("self_interaction", [False, True])
def test_pallas_interaction_matches_xla(rng, self_interaction):
    B, T, D = 16, 5, 8
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    ly = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    expect = dot_interaction(x, ly, self_interaction)
    got = dot_interaction_pallas(x, ly, self_interaction, tile_b=8,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_pallas_interaction_bad_tile():
    with pytest.raises(ValueError):
        dot_interaction_pallas(jnp.ones((10, 4)), jnp.ones((10, 3, 4)),
                               tile_b=4, interpret=True)


def test_pallas_interaction_gradients_match_xla(rng):
    """The custom VJP must reproduce XLA autodiff through the interaction."""
    B, T, D = 8, 5, 4
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    ly = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))

    def loss_p(x_, ly_):
        return jnp.sum(dot_interaction_pallas(x_, ly_, False, 8, True) ** 2)

    def loss_x(x_, ly_):
        return jnp.sum(dot_interaction(x_, ly_) ** 2)

    gx_p, gly_p = jax.grad(loss_p, argnums=(0, 1))(x, ly)
    gx_x, gly_x = jax.grad(loss_x, argnums=(0, 1))(x, ly)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gly_p), np.asarray(gly_x),
                               rtol=1e-4, atol=1e-4)
