"""Pallas fused photometric kernel vs the jnp oracle (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.ops.pallas_photometric import (
    photometric_map_reference,
    photometric_map_fused,
    photometric_vjp_reference,
    _pallas_backward,
    _pallas_forward,
    _pallas_forward_tiled,
)


def test_analytic_vjp_matches_autodiff(rng):
    """The hand-derived backward (adjoint box-filter composition) equals
    jax.vjp of the forward composition (VERDICT r1 item 6)."""
    a = jnp.asarray(rng.rand(2, 24, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 24, 32, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 24, 32, 1).astype(np.float32))

    for alpha, C1, C2 in ((0.85, 1e-4, 9e-4), (0.5, 1e-2, 9e-2)):
        _, vjp = jax.vjp(
            lambda x, y: photometric_map_reference(x, y, alpha, C1, C2), a, b
        )
        ga_ref, gb_ref = vjp(g)
        ga, gb = photometric_vjp_reference(a, b, g, alpha, C1, C2)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-5)


def test_backward_kernel_matches_autodiff_interpret(rng):
    """The fused Pallas backward kernel (interpret mode) equals jax.vjp of
    the forward composition, including the boundary-fold rows/cols."""
    a = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 16, 24, 1).astype(np.float32))
    alpha, C1, C2 = 0.85, 1e-4, 9e-4
    _, vjp = jax.vjp(lambda x, y: photometric_map_reference(x, y, alpha, C1, C2), a, b)
    ga_ref, gb_ref = vjp(g)
    ga, gb = _pallas_backward(a, b, g, alpha, C1, C2, interpret=True)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), atol=1e-5)


def test_kernel_matches_oracle_interpret(rng):
    a = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    ref = np.asarray(photometric_map_reference(a, b, 0.85, 1e-4, 9e-4))
    got = np.asarray(_pallas_forward(a, b, 0.85, 1e-4, 9e-4, interpret=True))
    assert got.shape == ref.shape == (2, 16, 24, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_gradients_match_reference(rng):
    a = jnp.asarray(rng.rand(1, 8, 12, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 8, 12, 3).astype(np.float32))

    def loss_fused(x, y):
        return jnp.sum(photometric_map_fused(x, y) ** 2)

    def loss_ref(x, y):
        return jnp.sum(photometric_map_reference(x, y, 0.85, 1e-4, 9e-4) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1))(a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_tiled_kernel_matches_oracle_interpret(rng):
    """H-tiled halo-DMA variant vs the oracle (interpret mode), covering the
    first/interior/last tile boundary handling."""
    from jax.experimental import pallas as pl  # noqa: F401

    a = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    ref = np.asarray(photometric_map_reference(a, b, 0.85, 1e-4, 9e-4))
    import functools
    import simpledepthestimation_tpu.ops.pallas_photometric as pp

    # run the tiled path in interpret mode by monkey-wrapping pallas_call
    import jax.experimental.pallas as _pl

    orig = _pl.pallas_call
    try:
        _pl.pallas_call = functools.partial(orig, interpret=True)
        got = np.asarray(pp._pallas_forward_tiled(a, b, 0.85, 1e-4, 9e-4, tile_h=32))
    finally:
        _pl.pallas_call = orig
    np.testing.assert_allclose(got, ref, atol=1e-5)
