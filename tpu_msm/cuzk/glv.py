"""Device-side GLV scalar split + endomorphism point-stream doubling.

No reference analogue (the reference decomposes full 254-bit scalars,
convert_point_coords_and_decompose_scalars.metal:94-121); see tpu_msm/glv.py
for the math and parameter derivation. This module is the trace-time
counterpart: planar fixed-point Babai rounding on 16-bit halfword limbs
(reusing the Barrett schoolbook multiplier, ops/barrett.py `mul_wide`),
producing for each input scalar k the pair (|k1|, |k2|) plus sign masks
with k = ±|k1| + lambda*(±|k2|) mod r.

`apply_glv` then rewrites the pipeline inputs:

    points:  (P_i)            -> (sign1_i * P_i, sign2_i * phi(P_i))
    digits:  decompose(k)     -> decompose(|k1|) ++ decompose(|k2|)

so every downstream stage (sort, prefix-scan SMVP, PBPR, host Horner)
runs unchanged on a 2n-point stream with cfg.num_windows halved. Signs
are applied by negating y (one lazy select per stream copy) rather than
by negating digits — digit negation would push +2^(s-1) out of the
canonical signed-digit range (and overflow the int16 digit buffer at
s = 16).

All multiplier constants fold at trace time; the per-scalar cost is a
few hundred u32 MACs — noise next to one Montgomery multiply of the
point encoding.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import MSMConfig
from ..constants import int_to_limbs
from ..glv import M_SHIFT, GLVParams
from ..ops import lazy, limbs
from ..ops.barrett import mul_wide
from . import decompose

U32 = jnp.uint32

# working width of the lattice combination: 12 halfwords = 192 bits of
# two's complement, comfortably holding |k_i| <= 2^127 plus sign
B_LIMBS = 12
_B_BITS = 16 * B_LIMBS


def _const(value: int, num_limbs: int, n: int) -> jnp.ndarray:
    """Non-negative int -> broadcast (num_limbs, n) u32 halfword planar."""
    arr = jnp.array(int_to_limbs(value, num_limbs, 16), U32)
    return jnp.broadcast_to(arr[:, None], (num_limbs, n))


def split_scalars(halfwords: jnp.ndarray, glvp: GLVParams
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, n) u32 scalar halfwords -> (neg1, mag1, neg2, mag2).

    mags are (B_LIMBS, n) u32 halfword magnitudes |k1|, |k2|; negs are
    (n,) bool sign masks. Bit-exact mirror of GLVParams.decompose (the
    python oracle): two mul-shift Babai roundings, two two's-complement
    lattice combinations, sign/magnitude extraction."""
    n = halfwords.shape[1]
    r = glvp.curve.scalar_modulus
    hs = (r.bit_length() + 15) // 16
    k = halfwords[:hs]
    shift_limbs = M_SHIFT // 16                       # 17

    cs = []
    for g in (glvp.g1, glvp.g2):
        gh = max(1, (g.bit_length() + 15) // 16)
        prod = mul_wide(k, _const(g, gh, n))          # (hs+gh, n)
        # rounding addend 2^(M_SHIFT-1): bit 15 of halfword 16
        rnd = _const(1 << (M_SHIFT - 1), prod.shape[0], n)
        prod = limbs.add_unsafe(prod, rnd)
        c = prod[shift_limbs:]                        # >> M_SHIFT
        # c < 2^129 (k < 2^255, g < 2^147); pad/trim to 9 limbs
        if c.shape[0] < 9:
            c = jnp.concatenate(
                [c, jnp.zeros((9 - c.shape[0], n), U32)], axis=0)
        cs.append(c[:9])
    c1, c2 = cs

    def mul_mod_b(c: jnp.ndarray, const: int) -> jnp.ndarray:
        """c * const mod 2^_B_BITS (const may be negative: two's
        complement representative)."""
        return mul_wide(c, _const(const % (1 << _B_BITS), B_LIMBS, n))[:B_LIMBS]

    zero = jnp.zeros((B_LIMBS, n), U32)
    k1 = limbs.sub(limbs.sub(k[:B_LIMBS], mul_mod_b(c1, glvp.a1)),
                   mul_mod_b(c2, glvp.a2))
    k2 = limbs.sub(zero, limbs.add_unsafe(mul_mod_b(c1, glvp.b1),
                                          mul_mod_b(c2, glvp.b2)))

    def sign_mag(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        neg = (x[B_LIMBS - 1] >> 15) == 1             # two's complement sign
        mag = limbs.select(neg, limbs.sub(zero, x), x)
        return neg, mag

    neg1, mag1 = sign_mag(k1)
    neg2, mag2 = sign_mag(k2)
    return neg1, mag1, neg2, mag2


def apply_glv(xm: jnp.ndarray, ym: jnp.ndarray, halfwords: jnp.ndarray,
              cfg: MSMConfig) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Montgomery-encoded points + raw scalar halfwords -> the doubled
    GLV stream: (xm', ym', digits) with n' = 2n lanes and
    cfg.num_windows (halved under glv) digit rows.

    Stream layout: lanes [0, n) carry sign1*P with digits of |k1|, lanes
    [n, 2n) carry sign2*phi(P) with digits of |k2|."""
    curve = cfg.curve
    glvp = cfg.glv_params
    W, s = cfg.num_windows, cfg.window_size
    # extract_windows reads halfword ((W-1)*s >> 4) + 1 — must exist
    assert ((W - 1) * s >> 4) + 1 < B_LIMBS

    neg1, mag1, neg2, mag2 = split_scalars(halfwords, glvp)
    d1 = decompose.signed_digits(decompose.extract_windows(mag1, s, W), s)
    d2 = decompose.signed_digits(decompose.extract_windows(mag2, s, W), s)
    digits = jnp.concatenate([d1, d2], axis=1)        # (W, 2n)

    # phi(P) = (beta * x, y); signs fold into y (-P = (x, -y)).
    beta_m = jnp.broadcast_to(
        lazy.const_limbs(curve.to_mont(glvp.beta), curve, 1), xm.shape)
    xb = lazy.mont_mul(xm, beta_m, curve, unroll=cfg.unroll_resolved)
    # 2p - y, re-rippled: downstream kernels assume canonical limbs
    yn = lazy.canonicalize(lazy.neg(ym, curve, 2), curve)
    y1 = jnp.where(neg1[None], yn, ym)
    y2 = jnp.where(neg2[None], yn, ym)

    xs2 = jnp.concatenate([xm, xb], axis=-1)
    ys2 = jnp.concatenate([y1, y2], axis=-1)
    return xs2, ys2, digits
