"""Codec parity tests against scalar re-derivations of the reference's
precision-reduction semantics (script/reduce_precision.py)."""

import jax.numpy as jnp
import numpy as np

from evstore_tpu.ops.quant import (dequantize, dequantize_int4,
                                   dequantize_int8, dequantize_ushort,
                                   quantize, quantize_int4, quantize_int8,
                                   quantize_ushort)


def ref_ushort_encode(value):
    """Scalar transliteration of convert_ev_float_to_ushort semantics."""
    if value < -0.65:
        leftover = int(-100 * (0.65 + value))
        if leftover % 2 == 0:
            leftover += 1
        return 65000 + leftover
    elif value > 0.65:
        leftover = int(100 * (value - 0.65))
        if leftover % 2 == 1:
            leftover -= 1
        return 65000 + leftover
    return int((value + 0.65) / 1.3 * 65000)


def ref_ushort_decode(value):
    if value > 65000:
        diff = (value - 65000) / 100
        return -(0.65 + diff) if value % 2 == 1 else (0.65 + diff)
    return (value / 65000) * 1.3 - 0.65


def ref_posit4_encode(v):
    pos = [0.8, 0.6, 0.4, 0.25, 0.015, 0.00025, 0]
    neg = [-1, -0.8, -0.6, -0.4, -0.25, -0.015, -0.00025]
    if v == 0:
        return 7
    if v > 0:
        for i, b in enumerate(pos):
            if v >= b:
                return i
    else:
        if v >= neg[-1]:
            return 8
        iv = 15
        for b in neg:
            if v < b:
                return iv
            iv -= 1
    raise AssertionError


POSIT4_TABLE = [1, 0.8, 0.6, 0.4, 0.0625, 0.00390625, 0.0000153, 0,
                -0.0000153, -0.00390625, -0.0625, -0.4, -0.6, -0.8, -1]


def test_int8_roundtrip():
    x = np.linspace(-1, 1, 509).astype(np.float32)
    enc = np.asarray(quantize_int8(jnp.asarray(x)))
    assert enc.dtype == np.uint8
    assert enc.min() >= 0 and enc.max() <= 254
    # reference encode: round(((x+1)/2)*254)
    expect = np.round(((x + 1) / 2) * 254).astype(np.uint8)
    np.testing.assert_array_equal(enc, expect)
    dec = np.asarray(dequantize_int8(jnp.asarray(enc)))
    np.testing.assert_allclose(dec, (enc / 254) * 2 - 1, rtol=1e-6)
    assert np.max(np.abs(dec - x)) < 1 / 127


def test_int8_zero_maps_near_zero():
    v = int(np.asarray(quantize_int8(jnp.asarray([0.0]))).item())
    assert v == 127
    d = float(np.asarray(dequantize_int8(jnp.asarray([np.uint8(127)]))).item())
    assert abs(d) < 0.005


def test_ushort_matches_reference_scalar():
    vals = np.concatenate([
        np.linspace(-0.99, 0.99, 797),
        np.array([-0.65, 0.65, 0.0, -0.651, 0.651, 0.9999, -0.9999]),
    ]).astype(np.float32)
    enc = np.asarray(quantize_ushort(jnp.asarray(vals)))
    for v, e in zip(vals, enc):
        # the vectorized codec computes in fp32, the scalar reference in
        # fp64; right at int-truncation boundaries they may differ by one
        # code (e.g. fp32(0.65) -> 64999.99.. vs 65000)
        assert abs(int(e) - ref_ushort_encode(float(v))) <= 1, v
    dec = np.asarray(dequantize_ushort(jnp.asarray(enc)))
    for e, d in zip(enc, dec):
        np.testing.assert_allclose(d, ref_ushort_decode(int(e)), atol=1e-5)
    # dense-region absolute error bound: 1.3/65000 (+1 code of fp32 slack)
    dense = np.abs(vals) <= 0.65
    assert np.max(np.abs(dec[dense] - vals[dense])) < 2 * 1.3 / 65000


def test_posit4_matches_reference_scalar():
    vals = np.concatenate([
        np.linspace(-1.0, 1.0, 1003),
        np.array([0.0, 0.00025, -0.00025, 0.8, -0.8, 0.015, -0.015]),
    ]).astype(np.float32)
    brackets = np.array([0.8, 0.6, 0.4, 0.25, 0.015, 0.00025, 0.0])
    enc = np.asarray(quantize_int4(jnp.asarray(vals)))
    for v, e in zip(vals, enc):
        expect = ref_posit4_encode(float(v))
        if np.min(np.abs(np.abs(v) - brackets)) < 1e-6:
            # fp32 codec vs fp64 scalar reference can land one bracket apart
            # exactly at a bracket edge (fp32(-0.00025) < fp64 -0.00025)
            assert abs(int(e) - expect) <= 1, v
        else:
            assert int(e) == expect, v
    dec = np.asarray(dequantize_int4(jnp.asarray(enc)))
    for e, d in zip(enc, dec):
        np.testing.assert_allclose(d, POSIT4_TABLE[int(e)], rtol=1e-5)


def test_posit4_zero_is_exact():
    assert int(np.asarray(quantize_int4(jnp.asarray([0.0]))).item()) == 7
    assert float(np.asarray(dequantize_int4(jnp.asarray([np.uint8(7)]))).item()) == 0.0


def test_dispatch():
    x = jnp.asarray(np.linspace(-0.9, 0.9, 64).astype(np.float32))
    for bits in (32, 16, 8, 4):
        enc = quantize(x, bits)
        dec = dequantize(enc, bits)
        assert dec.shape == x.shape
        if bits == 32:
            np.testing.assert_array_equal(np.asarray(dec), np.asarray(x))
