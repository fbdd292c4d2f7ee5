"""Mixed-precision embedding codecs.

Behavioral parity with the reference's offline precision-reduction pipeline and
the in-cache decoders:

- 8-bit:  enc round(((x+1)/2)*254), dec (v/254)*2-1
  (script/reduce_precision.py:270,283; mixed_precs_caching/evlfu_8.cpp:370-378)
- 16-bit: custom ushort codec, NOT IEEE fp16.  Dense range [-0.65, 0.65]
  maps linearly onto 0..65000; outliers |x|>0.65 are stored as
  65000 + int(100*(|x|-0.65)) with the sign carried in the parity
  (odd=negative, even=positive)
  (script/reduce_precision.py:26-67; evlfu_16.cpp:332-347)
- 4-bit:  posit-like bracket map, 15 codes (0..14), code 7 == 0.0; decode via
  a fixed value table (script/reduce_precision.py:140-185; evlfu_4.cpp:319-341)

All codecs are pure jnp functions (vectorized, jittable, usable inside Pallas
kernels) and operate on fp32 inputs in [-1, 1] — the reference asserts the
same domain for trained EV tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- 8-bit codec

def quantize_int8(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> uint8 in 0..254."""
    v = jnp.round(((x + 1.0) / 2.0) * 254.0)
    return jnp.clip(v, 0, 254).astype(jnp.uint8)


def dequantize_int8(v: jnp.ndarray) -> jnp.ndarray:
    return (v.astype(jnp.float32) / 254.0) * 2.0 - 1.0


# --------------------------------------------------------------- 16-bit codec

def quantize_ushort(x: jnp.ndarray) -> jnp.ndarray:
    """Custom ushort codec: dense [-0.65,0.65] -> 0..65000, outliers in parity."""
    xf = x.astype(jnp.float32)
    dense = ((xf + 0.65) / 1.3 * 65000.0).astype(jnp.int32)

    neg_left = (-100.0 * (0.65 + xf)).astype(jnp.int32)
    neg_left = jnp.where(neg_left % 2 == 0, neg_left + 1, neg_left)   # force odd
    neg_code = 65000 + neg_left

    pos_left = (100.0 * (xf - 0.65)).astype(jnp.int32)
    pos_left = jnp.where(pos_left % 2 == 1, pos_left - 1, pos_left)   # force even
    pos_code = 65000 + pos_left

    out = jnp.where(xf < -0.65, neg_code, jnp.where(xf > 0.65, pos_code, dense))
    return jnp.clip(out, 0, 65535).astype(jnp.uint16)


def dequantize_ushort(v: jnp.ndarray) -> jnp.ndarray:
    vi = v.astype(jnp.int32)
    diff = (vi - 65000).astype(jnp.float32) / 100.0
    outlier = jnp.where(vi % 2 == 1, -(0.65 + diff), 0.65 + diff)
    dense = (vi.astype(jnp.float32) / 65000.0) * 1.3 - 0.65
    return jnp.where(vi > 65000, outlier, dense)


# ---------------------------------------------------------------- 4-bit codec

# decode table: script/reduce_precision.py:174-177 (convert_from_4bit_int_posit)
_POSIT4_DECODE = np.array(
    [1.0, 0.8, 0.6, 0.4, 0.0625, 0.00390625, 0.0000153, 0.0,
     -0.0000153, -0.00390625, -0.0625, -0.4, -0.6, -0.8, -1.0, -1.0],
    dtype=np.float32)  # index 15 never produced; mirror of 14 for safety

# encode brackets: convert_to_4bit_int_posit (reduce_precision.py:140-172)
_POS_BRACKETS = np.array([0.8, 0.6, 0.4, 0.25, 0.015, 0.00025, 0.0],
                         dtype=np.float32)
_NEG_BRACKETS = np.array([-1.0, -0.8, -0.6, -0.4, -0.25, -0.015, -0.00025],
                         dtype=np.float32)


def quantize_int4(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> codes 0..14 (uint8; packing into nibbles is the storage
    layer's job — see evstore_tpu.cache and the native engine)."""
    xf = x.astype(jnp.float32)
    pos_brackets = jnp.asarray(_POS_BRACKETS)
    neg_brackets = jnp.asarray(_NEG_BRACKETS)

    # positive: first bracket index i with x >= bracket[i]
    pos_ge = xf[..., None] >= pos_brackets          # [..., 7]
    pos_code = jnp.argmax(pos_ge, axis=-1)          # 0..6 (always hits: bracket 0.0)

    # negative: walk brackets from most-negative; x >= -0.00025 -> 8,
    # else start at 15 and decrement while x >= bracket
    close_to_zero = xf >= -0.00025
    neg_lt = xf[..., None] < neg_brackets           # [..., 7]
    # number of brackets that x is below; code = 8 + count of brackets > x
    neg_code = 8 + jnp.sum(neg_lt, axis=-1)
    neg_code = jnp.where(close_to_zero, 8, neg_code)

    code = jnp.where(xf == 0.0, 7,
                     jnp.where(xf > 0.0, pos_code, neg_code))
    return jnp.clip(code, 0, 14).astype(jnp.uint8)


def dequantize_int4(codes: jnp.ndarray) -> jnp.ndarray:
    table = jnp.asarray(_POSIT4_DECODE)
    return table[codes.astype(jnp.int32)]


# ----------------------------------------------- numpy twins (host hot path)
# The cache/storage layer decodes on the host; these mirror the jnp codecs
# exactly but avoid any device round-trip.

def np_dequantize_int8(v: np.ndarray) -> np.ndarray:
    return (v.astype(np.float32) / 254.0) * 2.0 - 1.0


def np_quantize_int8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(((x.astype(np.float32) + 1.0) / 2.0) * 254.0),
                   0, 254).astype(np.uint8)


def np_dequantize_ushort(v: np.ndarray) -> np.ndarray:
    vi = v.astype(np.int32)
    diff = (vi - 65000).astype(np.float32) / 100.0
    outlier = np.where(vi % 2 == 1, -(0.65 + diff), 0.65 + diff)
    dense = (vi.astype(np.float32) / 65000.0) * np.float32(1.3) - np.float32(0.65)
    return np.where(vi > 65000, outlier, dense).astype(np.float32)


def np_quantize_ushort(x: np.ndarray) -> np.ndarray:
    xf = x.astype(np.float32)
    dense = ((xf + np.float32(0.65)) / np.float32(1.3) * 65000.0).astype(np.int32)
    neg_left = (np.float32(-100.0) * (np.float32(0.65) + xf)).astype(np.int32)
    neg_left = np.where(neg_left % 2 == 0, neg_left + 1, neg_left)
    pos_left = (np.float32(100.0) * (xf - np.float32(0.65))).astype(np.int32)
    pos_left = np.where(pos_left % 2 == 1, pos_left - 1, pos_left)
    out = np.where(xf < np.float32(-0.65), 65000 + neg_left,
                   np.where(xf > np.float32(0.65), 65000 + pos_left, dense))
    return np.clip(out, 0, 65535).astype(np.uint16)


def np_dequantize_int4(codes: np.ndarray) -> np.ndarray:
    return _POSIT4_DECODE[codes.astype(np.int32)]


def np_quantize_int4(x: np.ndarray) -> np.ndarray:
    xf = x.astype(np.float32)
    pos_code = np.argmax(xf[..., None] >= _POS_BRACKETS, axis=-1)
    neg_code = 8 + np.sum(xf[..., None] < _NEG_BRACKETS, axis=-1)
    neg_code = np.where(xf >= np.float32(-0.00025), 8, neg_code)
    code = np.where(xf == 0.0, 7, np.where(xf > 0.0, pos_code, neg_code))
    return np.clip(code, 0, 14).astype(np.uint8)


# ------------------------------------------------------------------ dispatch

def quantize(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    if bits == 32:
        return x.astype(jnp.float32)
    if bits == 16:
        return quantize_ushort(x)
    if bits == 8:
        return quantize_int8(x)
    if bits == 4:
        return quantize_int4(x)
    raise ValueError(f"unsupported precision {bits}")


def dequantize(v: jnp.ndarray, bits: int) -> jnp.ndarray:
    if bits == 32:
        return v.astype(jnp.float32)
    if bits == 16:
        return dequantize_ushort(v)
    if bits == 8:
        return dequantize_int8(v)
    if bits == 4:
        return dequantize_int4(v)
    raise ValueError(f"unsupported precision {bits}")
