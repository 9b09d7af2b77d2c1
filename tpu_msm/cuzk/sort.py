"""Pipeline stage 2: group point indices by bucket — the sort.

The reference implements this as a CSR->CSC sparse-matrix transpose with
atomics and one serial thread per subtask (shader/cuzk/transpose.metal:8-65,
the Wang et al. ICS'16 3-phase histogram/prefix/scatter) — which IS a
stable counting sort of point indices by bucket value. On TPU there are no
atomics and serial-per-subtask threads waste the machine; the XLA-native
equivalent is a batched stable argsort over the bucket keys (SURVEY.md §7
"Sort instead of atomic transpose").

`csc_col_ptr` reproduces the CSC column-pointer array itself (histogram +
exclusive prefix sum) for capability parity and stage-level tests.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

I32 = jnp.int32


def bucket_keys(digits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Signed digits -> (bucket index |d|, negative-sign mask).

    The signed-bucket fold of smvp.metal:46-105: digit d > 0 contributes P
    to bucket d, d < 0 contributes -P to bucket |d|, d == 0 contributes
    nothing (bucket 0 is a discard slot)."""
    return jnp.abs(digits), digits < 0


def sort_by_bucket(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched stable sort of (..., n) int32 keys along the last axis.

    Returns (sorted_keys, perm) with sorted_keys = take(keys, perm).
    Stability matches the reference's transpose scatter order
    (transpose.metal:45-63), though any order yields the same bucket sums
    (EC addition is commutative)."""
    perm = jnp.argsort(keys, axis=-1, stable=True)
    sorted_keys = jnp.take_along_axis(keys, perm, axis=-1)
    return sorted_keys, perm


def csc_col_ptr(keys: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """CSC column pointers: exclusive prefix sum of the bucket histogram —
    the `all_csc_col_ptr` output of transpose.metal (:27-43) built with
    one one-hot contraction + cumsum instead of atomic increments.

    keys: (..., n) int32 in [0, num_buckets); returns (..., num_buckets+1)
    int32 with ptr[..., b+1] - ptr[..., b] = count of b."""
    one_hot = (keys[..., None] == jnp.arange(num_buckets, dtype=I32)).astype(I32)
    hist = one_hot.sum(axis=-2)
    zeros = jnp.zeros(hist.shape[:-1] + (1,), I32)
    return jnp.concatenate([zeros, jnp.cumsum(hist, axis=-1)], axis=-1)
