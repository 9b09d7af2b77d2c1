"""Pipeline stage 1: point conversion + signed scalar-window decomposition.

Analogue of shader/cuzk/convert_point_coords_and_decompose_scalars.metal:
  - coordinate Montgomery-encoding (:72-88) — here via mont_mul-by-R^2
    (ops/mont.py) instead of Barrett field_mul(x, R);
  - window extraction from packed halfwords (:94-107 +
    extract_word_from_bytes_le.metal:7-31) — here static shift/or over a
    planar (halfwords, n) array, one unrolled step per window;
  - signed-digit conversion with carry (:108-121) — slice >= 2^(s-1)
    becomes slice - 2^s with carry 1. The reference stores digits biased
    by +2^(s-1) for its unsigned buffers; we keep them as int32 signed
    digits (bucket = |digit|, sign = digit < 0 — the same fold smvp.metal
    :46-105 performs when it un-biases).

All shapes are static: num_windows unrolled python loops, batch axis n on
VPU lanes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import MSMConfig
from ..constants import CurveParams
from ..ops import lazy

U32 = jnp.uint32
I32 = jnp.int32


def points_to_mont(xs: jnp.ndarray, ys: jnp.ndarray, curve: CurveParams,
                   unroll: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard-form planar affine coordinates (int32 canonical limbs) ->
    Montgomery form via mont_mul-by-R^2 on the signed-lazy path."""
    return (lazy.to_mont(xs, curve, unroll=unroll),
            lazy.to_mont(ys, curve, unroll=unroll))


def extract_windows(halfwords: jnp.ndarray, window_size: int,
                    num_windows: int) -> jnp.ndarray:
    """(H, n) uint32 16-bit halfwords -> (W, n) raw unsigned windows.

    Window w covers scalar bits [w*s, (w+1)*s); with s <= 16 each window
    spans at most two halfwords, combined with static shifts (the planar
    counterpart of extract_word_from_bytes_le.metal:7-31, including the
    top-window slack handling :103-107 — the pad halfword covers reads
    past the scalar's top bit)."""
    s = window_size
    mask = U32((1 << s) - 1)
    rows = []
    for w in range(num_windows):
        bit = w * s
        i, off = bit >> 4, bit & 15
        val = halfwords[i] >> off
        if off:
            val = val | (halfwords[i + 1] << (16 - off))
        rows.append(val & mask)
    return jnp.stack(rows)


def signed_digits(raw: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Raw windows -> signed digits in [-2^(s-1), 2^(s-1)], carry-chained
    across windows (convert_...metal:108-121): digits d_w satisfy
    scalar == sum_w d_w * 2^(s*w). The final carry is provably zero for
    canonical scalars (top window < 2^(s-1) by the MSMConfig.__post_init__
    width check); tests assert reconstruction."""
    s = window_size
    l = U32(1 << s)
    half = U32(1 << (s - 1))
    num_windows = raw.shape[0]
    out = []
    carry = jnp.zeros(raw.shape[1:], U32)
    for w in range(num_windows):
        val = raw[w] + carry
        ge = val >= half
        digit = val.astype(I32) - jnp.where(ge, jnp.int32(1 << s), 0)
        out.append(digit)
        carry = ge.astype(U32)
    return jnp.stack(out)


def decompose(halfwords: jnp.ndarray, cfg: MSMConfig) -> jnp.ndarray:
    """(H, n) scalar halfwords -> (W, n) int32 signed digits."""
    raw = extract_windows(halfwords, cfg.window_size, cfg.num_windows)
    return signed_digits(raw, cfg.window_size)
