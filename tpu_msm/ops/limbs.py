"""Planar multi-limb big-integer arithmetic on uint32 arrays.

TPU-native analogue of the reference's per-thread bignum structs and ops
(shader/bigint/bigint.metal: bigint_add_unsafe :7-22, bigint_add_wide :24-42,
bigint_sub :44-62, bigint_sub_wide :64-82, bigint_gte :84-97, bigint_eq
:114-124, bigint_to_wide :137-146; shader/misc/types.metal BigInt/BigIntWide).

Layout: a big integer batch is a single jnp.uint32 array of shape
(num_limbs, ...batch) — limb axis FIRST, so the (large) batch axis lands on
VPU lanes and the 16-limb axis on sublanes. Limb values occupy the low
`log_limb_size` bits (16 by default); the limb loop is a *static* Python
loop, unrolled at trace time, so XLA sees straight-line vector code with no
data-dependent control flow (SURVEY.md §7 "planar limb layout").

All carry/borrow chains are fixed-depth ripples — products and sums of
16-bit limbs provably fit uint32 (the same MASK discipline as
bigint.metal:13-21).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

U32 = jnp.uint32


def zeros_like_batch(ref: jnp.ndarray, num_limbs: int) -> jnp.ndarray:
    return jnp.zeros((num_limbs,) + ref.shape[1:], U32)


def add_unsafe(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16) -> jnp.ndarray:
    """Limbwise add with carry ripple, final carry dropped.

    Mirror of bigint_add_unsafe (bigint.metal:7-22): caller guarantees the
    true sum fits in num_limbs limbs."""
    mask = U32((1 << log_limb_size) - 1)
    num_limbs = a.shape[0]
    out = []
    carry = jnp.zeros(a.shape[1:], U32)
    for i in range(num_limbs):
        s = a[i] + b[i] + carry
        out.append(s & mask)
        carry = s >> log_limb_size
    return jnp.stack(out)


def add_wide(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16) -> jnp.ndarray:
    """Limbwise add returning num_limbs+1 limbs (bigint_add_wide, :24-42)."""
    mask = U32((1 << log_limb_size) - 1)
    num_limbs = a.shape[0]
    out = []
    carry = jnp.zeros(a.shape[1:], U32)
    for i in range(num_limbs):
        s = a[i] + b[i] + carry
        out.append(s & mask)
        carry = s >> log_limb_size
    out.append(carry)
    return jnp.stack(out)


def sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b limbwise; returns (difference mod 2^(L*w), final_borrow in {0,1}).

    The borrow ripple runs in uint32 two's complement: each limb computes
    a[i] - b[i] - borrow, whose low `w` bits are the result limb and whose
    sign (bit 31, after wraparound) is the next borrow. Covers both
    bigint_sub (bigint.metal:44-62, assumes a>=b) and the gte check
    (bigint_gte :84-97, which is `final_borrow == 0`)."""
    mask = U32((1 << log_limb_size) - 1)
    num_limbs = a.shape[0]
    out = []
    borrow = jnp.zeros(a.shape[1:], U32)
    for i in range(num_limbs):
        d = a[i] - b[i] - borrow
        out.append(d & mask)
        borrow = d >> U32(31)  # 1 iff the u32 subtraction wrapped
    return jnp.stack(out), borrow


def sub(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16) -> jnp.ndarray:
    """a - b assuming a >= b (bigint_sub, bigint.metal:44-62)."""
    return sub_with_borrow(a, b, log_limb_size)[0]


def gte(a: jnp.ndarray, b: jnp.ndarray, log_limb_size: int = 16) -> jnp.ndarray:
    """a >= b, boolean of batch shape (bigint_gte, bigint.metal:84-97)."""
    _, borrow = sub_with_borrow(a, b, log_limb_size)
    return borrow == 0


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limbwise equality reduced over the limb axis (bigint_eq, :114-124)."""
    return jnp.all(a == b, axis=0)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """All-limbs-zero test (bigint.metal `bigint_is_zero`)."""
    return jnp.all(a == 0, axis=0)


def to_wide(a: jnp.ndarray) -> jnp.ndarray:
    """Append one zero limb (bigint_to_wide, :137-146)."""
    return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], U32)], axis=0)


def from_wide(a: jnp.ndarray, num_limbs: int) -> jnp.ndarray:
    """Drop high limbs (bigint_from_wide); caller guarantees they are zero."""
    return a[:num_limbs]


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-element limb-array select: cond has batch shape, a/b limb shape."""
    return jnp.where(cond[None], a, b)
