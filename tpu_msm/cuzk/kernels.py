"""Pallas/Mosaic kernels for the MSM hot path.

The production device kernels, replacing the five Metal compute shaders
of the reference (shader_manager.rs:31-60) with four TPU kernels built on
list-form limb arithmetic (ops/rows.py):

  encode_mont     <-> convert_point_coords (Montgomery encode) — the
                      reference's Barrett field_mul(x, R) stage
                      (convert_...metal:72-88)
  prefix_scan     <-> the SMVP bucket accumulation (smvp.metal:14-107),
                      re-formulated: instead of one thread per bucket
                      serially adding its CSC row, ONE sequential grid
                      walks the sorted point stream and emits running
                      (unsegmented!) prefix sums; bucket sums fall out
                      afterwards as G(end) minus G(start-1) — two gathers
                      and one point subtraction (negation is free in the
                      group), so no scatters, no segment flags, no
                      cross-column stitch logic anywhere.
  padd_batch      <-> the jacobian_add hot inline (jacobian.metal:46-100)
                      as a standalone batched complete-add kernel used by
                      extraction, column-prefix and reduction trees.
  pbpr_stage1     <-> bpr_stage_1 (pbpr.metal:33-96): cuZK Alg.4 m/g
                      running sums over bucket slices.

Layout contract: all kernel arrays carry limbs STACKED on the leading
axis (host side) but are consumed as per-limb row lists inside the
kernels — the limb axis exists only at trace time, so the compiled code
is flat elementwise dataflow (see ops/rows.py docstring for why this is
~1000x faster than stacked limb shifts on v5e).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CurveParams, int_to_limbs
from ..ops import rows

I32 = jnp.int32


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# v5e has 128 MB of VMEM; the default 16 MB scoped limit is far too small
# for the live set of a 12-mul complete-add body at wide blocks.
_COMPILER_PARAMS = None if jax.default_backend() != "tpu" else     pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _stack3(p: rows.ProjRows) -> jnp.ndarray:
    return jnp.stack([jnp.stack(p.x), jnp.stack(p.y), jnp.stack(p.z)])


# ---------------------------------------------------------------------------
# Montgomery encode: x -> x*R (by R^2 constant)
# ---------------------------------------------------------------------------


def _encode_kernel(x_ref, o_ref, *, curve: CurveParams, L: int, S: int):
    a = [x_ref[i] for i in range(L)]
    r = rows.to_mont_rows(a, curve)
    for i in range(L):
        o_ref[i] = r[i]


def encode_mont(xs: jnp.ndarray, curve: CurveParams,
                block: int = 512) -> jnp.ndarray:
    """(L, n) canonical standard-form limbs -> Montgomery form, via a
    grid-blocked Pallas kernel. n must be a multiple of 8*block."""
    L, n = xs.shape
    S = 8
    V = n // S
    bv = min(block, V)
    if V % bv:
        raise ValueError(f"n={n} not blockable by {S}x{bv}")
    x3 = xs.reshape(L, S, V)
    spec = pl.BlockSpec((L, S, bv), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_encode_kernel, curve=curve, L=L, S=S),
        grid=(V // bv,),
        out_shape=jax.ShapeDtypeStruct((L, S, V), I32),
        in_specs=[spec], out_specs=spec,
        input_output_aliases={0: 0},
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x3)
    return out.reshape(L, n)


# ---------------------------------------------------------------------------
# Prefix scan over the sorted point stream (the SMVP core)
# ---------------------------------------------------------------------------


def _scan_kernel(sx_ref, sy_ref, sg_ref, o_ref, carry_ref, *,
                 curve: CurveParams, L: int):
    r = pl.program_id(0)
    S = 8

    @pl.when(r == 0)
    def _():
        zero = sx_ref[0:S, :] * 0
        one = int_to_limbs(curve.r_mod_p, L, curve.log_limb_size)
        for i in range(L):
            carry_ref[i * S:(i + 1) * S, :] = zero
            carry_ref[(L + i) * S:(L + i + 1) * S, :] = zero + one[i]
            carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] = zero

    x = [sx_ref[i * S:(i + 1) * S, :] for i in range(L)]
    y = [sy_ref[i * S:(i + 1) * S, :] for i in range(L)]
    sign = sg_ref[:, :]                       # (8, F8) int32 0/1
    yneg = rows.neg_rows(y, curve, 2)         # digit < 0 -> add -P
    y = rows.select_rows(sign != 0, yneg, y)
    carry = rows.ProjRows(
        [carry_ref[i * S:(i + 1) * S, :] for i in range(L)],
        [carry_ref[(L + i) * S:(L + i + 1) * S, :] for i in range(L)],
        [carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] for i in range(L)])
    acc = rows.pmadd_rows(carry, x, y, curve)
    for i in range(L):
        carry_ref[i * S:(i + 1) * S, :] = acc.x[i]
        carry_ref[(L + i) * S:(L + i + 1) * S, :] = acc.y[i]
        carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] = acc.z[i]
        o_ref[i * S:(i + 1) * S, :] = acc.x[i]
        o_ref[(L + i) * S:(L + i + 1) * S, :] = acc.y[i]
        o_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] = acc.z[i]


def prefix_scan(sx8: jnp.ndarray, sy8: jnp.ndarray, sign8: jnp.ndarray,
                curve: CurveParams, f8: int) -> jnp.ndarray:
    """Running prefix sums of the sorted, sign-folded point stream.

    Full-sublane layout: per grid step the kernel consumes (8, F8)
    tiles per limb (anything narrower wastes VPU sublanes — a (2, C)
    limb row runs at 25% occupancy). The caller lays the per-step
    stream of F = Wg*C lanes out as (8, F8 = F/8) and stacks steps on
    the last axis:

    sx8, sy8: (L*8, R*F8) int32 Montgomery coords; block r covers
        stream positions [r*F, (r+1)*F) of the window group.
    sign8: (8, R*F8) negative-digit flags, same layout.
    Returns tbuf (3*L*8, R*F8): inclusive per-lane prefix points.
    """
    L8, n8 = sx8.shape
    L = L8 // 8
    R = n8 // f8
    in_spec = pl.BlockSpec((L8, f8), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    sg_spec = pl.BlockSpec((8, f8), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * L8, f8), lambda r: (0, r),
                            memory_space=pltpu.VMEM)
    tbuf = pl.pallas_call(
        functools.partial(_scan_kernel, curve=curve, L=L),
        grid=(R,),
        out_shape=jax.ShapeDtypeStruct((3 * L8, n8), I32),
        in_specs=[in_spec, in_spec, sg_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((3 * L8, f8), I32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(sx8, sy8, sign8.astype(I32))
    return tbuf


def _globalize_kernel(t_ref, s_ref, o_ref, *, curve: CurveParams, L: int):
    S = 8

    def pt(ref):
        def coord(c):
            return [ref[(c * L + i) * S:(c * L + i + 1) * S, :]
                    for i in range(L)]
        return rows.ProjRows(coord(0), coord(1), coord(2))

    out = rows.padd_rows(pt(t_ref), pt(s_ref), curve)
    for c, coord in enumerate((out.x, out.y, out.z)):
        for i in range(L):
            o_ref[(c * L + i) * S:(c * L + i + 1) * S, :] = coord[i]


def globalize(tbuf: jnp.ndarray, s8: jnp.ndarray, curve: CurveParams,
              f8: int) -> jnp.ndarray:
    """G[r-block] = T[r-block] + S (one complete add per stream position,
    S broadcast across grid steps) — fused in the scan kernel's exact
    (3*L*8, F8) block layout with the output aliased onto tbuf, so no
    reshapes/retiles and no 4 GB temporaries at 2^24.

    tbuf: (3*L*8, R*F8) prefix buffer from prefix_scan.
    s8:   (3*L*8, F8) per-lane exclusive column prefix in kernel layout.
    """
    L8x3, n8 = tbuf.shape
    R = n8 // f8
    t_spec = pl.BlockSpec((L8x3, f8), lambda r: (0, r),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((L8x3, f8), lambda r: (0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_globalize_kernel, curve=curve, L=L8x3 // 24),
        grid=(R,),
        out_shape=jax.ShapeDtypeStruct((L8x3, n8), I32),
        in_specs=[t_spec, s_spec],
        out_specs=t_spec,
        input_output_aliases={0: 0},
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(tbuf, s8)


# ---------------------------------------------------------------------------
# Batched complete point add (and subtract via pre-negated y)
# ---------------------------------------------------------------------------


def _padd_kernel(p_ref, q_ref, o_ref, *, curve: CurveParams, L: int):
    def pt(ref):
        return rows.ProjRows([ref[i] for i in range(L)],
                             [ref[L + i] for i in range(L)],
                             [ref[2 * L + i] for i in range(L)])
    s = rows.padd_rows(pt(p_ref), pt(q_ref), curve)
    for i in range(L):
        o_ref[i] = s.x[i]
        o_ref[L + i] = s.y[i]
        o_ref[2 * L + i] = s.z[i]


def padd_batch(p: jnp.ndarray, q: jnp.ndarray, curve: CurveParams,
               block: int = 512, alias_p: bool = False) -> jnp.ndarray:
    """Complete projective add on stacked batches.

    p, q: (3, L, *batch) int32 lazy limbs (values < 4p). Returns the same
    shape. Batch is flattened and blocked over an (8, block) grid; lanes
    are padded to a multiple of 8*block with zeros (harmless: garbage in,
    garbage out in dropped lanes). alias_p=True reuses p's buffer for the
    output (donation) — only when the caller is done with p; saves a full
    result allocation on big streams (the gbuf globalize pass)."""
    L = p.shape[1]
    batch_shape = p.shape[2:]
    F = 1
    for d in batch_shape:
        F *= d
    bv = min(block, -(-F // 8))
    unit = 8 * bv
    Fp = -(-F // unit) * unit
    p2 = p.reshape(3 * L, F)
    q2 = q.reshape(3 * L, F)
    if Fp != F:
        pad = ((0, 0), (0, Fp - F))
        p2 = jnp.pad(p2, pad)
        q2 = jnp.pad(q2, pad)
    p3 = p2.reshape(3 * L, 8, Fp // 8)
    q3 = q2.reshape(3 * L, 8, Fp // 8)
    spec = pl.BlockSpec((3 * L, 8, bv), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_padd_kernel, curve=curve, L=L),
        grid=((Fp // 8) // bv,),
        out_shape=jax.ShapeDtypeStruct((3 * L, 8, Fp // 8), I32),
        in_specs=[spec, spec], out_specs=spec,
        input_output_aliases={0: 0} if alias_p else {},
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(p3, q3)
    return out.reshape(3 * L, Fp)[:, :F].reshape(3, L, *batch_shape)


def pneg_stacked(p: jnp.ndarray, curve: CurveParams, k: int = 4) -> jnp.ndarray:
    """Point negation on a stacked (3, L, ...) batch: y -> k*p - y.
    Pure elementwise — fast in plain XLA, no kernel needed."""
    L = p.shape[1]
    kp = jnp.array(int_to_limbs(k * curve.p, L, curve.log_limb_size),
                   I32).reshape(L, *([1] * (p.ndim - 2)))
    return jnp.stack([p[0], kp - p[1], p[2]])


def psub_batch(p: jnp.ndarray, q: jnp.ndarray, curve: CurveParams,
               block: int = 512) -> jnp.ndarray:
    """p - q on stacked batches (q.y must be < 4p)."""
    return padd_batch(p, pneg_stacked(q, curve), curve, block)


def _pdbl_kernel(p_ref, o_ref, *, curve: CurveParams, L: int):
    p = rows.ProjRows([p_ref[i] for i in range(L)],
                      [p_ref[L + i] for i in range(L)],
                      [p_ref[2 * L + i] for i in range(L)])
    s = rows.pdbl_rows(p, curve)
    for i in range(L):
        o_ref[i] = s.x[i]
        o_ref[L + i] = s.y[i]
        o_ref[2 * L + i] = s.z[i]


def pdbl_batch(p: jnp.ndarray, curve: CurveParams,
               block: int = 512) -> jnp.ndarray:
    """Complete doubling on a stacked (3, L, *batch)."""
    L = p.shape[1]
    batch_shape = p.shape[2:]
    F = 1
    for d in batch_shape:
        F *= d
    bv = min(block, -(-F // 8))
    unit = 8 * bv
    Fp = -(-F // unit) * unit
    p2 = p.reshape(3 * L, F)
    if Fp != F:
        p2 = jnp.pad(p2, ((0, 0), (0, Fp - F)))
    p3 = p2.reshape(3 * L, 8, Fp // 8)
    spec = pl.BlockSpec((3 * L, 8, bv), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_pdbl_kernel, curve=curve, L=L),
        grid=((Fp // 8) // bv,),
        out_shape=jax.ShapeDtypeStruct((3 * L, 8, Fp // 8), I32),
        in_specs=[spec], out_specs=spec,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(p3)
    return out.reshape(3 * L, Fp)[:, :F].reshape(3, L, *batch_shape)


def inf_stacked(curve: CurveParams, batch_shape: Tuple[int, ...]) -> jnp.ndarray:
    """(3, L, *batch) stacked infinity (0 : 1m : 0), canonical limbs."""
    L = curve.num_limbs
    one = jnp.array(int_to_limbs(curve.r_mod_p, L, curve.log_limb_size),
                    I32).reshape(1, L, *([1] * len(batch_shape)))
    z = jnp.zeros((1, L) + tuple(batch_shape), I32)
    return jnp.concatenate([z, jnp.broadcast_to(one, z.shape), z], axis=0)


# ---------------------------------------------------------------------------
# PBPR stage 1: m/g running sums over descending bucket slices
# ---------------------------------------------------------------------------


def _pbpr_kernel(b_ref, m_ref, g_ref, mg_ref, *, curve: CurveParams,
                 L: int, W: int, Bt: int, goff: int):
    """goff = row offset of the g accumulator inside mg_ref (the padded
    per-block row count; rows [3LW, goff) are alignment padding and are
    never read or written)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        one = int_to_limbs(curve.r_mod_p, L, curve.log_limb_size)
        zero = b_ref[0:W, :] * 0
        for i in range(L):
            for c in range(3):
                v = zero + one[i] if c == 1 else zero
                mg_ref[(c * L + i) * W:(c * L + i + 1) * W, :] = v
                mg_ref[goff + (c * L + i) * W:
                       goff + (c * L + i + 1) * W, :] = v

    def pt_rows(ref, base):
        return rows.ProjRows(
            [ref[base + i * W:base + (i + 1) * W, :] for i in range(L)],
            [ref[base + (L + i) * W:base + (L + i + 1) * W, :]
             for i in range(L)],
            [ref[base + (2 * L + i) * W:base + (2 * L + i + 1) * W, :]
             for i in range(L)])

    bucket = pt_rows(b_ref, 0)
    m = pt_rows(mg_ref, 0)
    g = pt_rows(mg_ref, goff)
    m = rows.padd_rows(m, bucket, curve)
    g = rows.padd_rows(g, m, curve)
    for i in range(L):
        for c, coord in enumerate((m.x, m.y, m.z)):
            mg_ref[(c * L + i) * W:(c * L + i + 1) * W, :] = coord[i]
            m_ref[(c * L + i) * W:(c * L + i + 1) * W, :] = coord[i]
        for c, coord in enumerate((g.x, g.y, g.z)):
            mg_ref[goff + (c * L + i) * W:
                   goff + (c * L + i + 1) * W, :] = coord[i]
            g_ref[(c * L + i) * W:(c * L + i + 1) * W, :] = coord[i]


def pbpr_stage1(buckets: jnp.ndarray, curve: CurveParams,
                threads: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cuZK Alg.4 stage 1 (pbpr.metal:33-96): split each window's B
    buckets into T slices of Bt; walk each slice from its top bucket down
    with m (running slice sum) and g (locally-weighted sum) accumulators.

    buckets: (3, L, W, B) stacked lazy points, slot b = multiplier b+1.
    Returns (m, g), each (3, L, W, T)."""
    _, L, W, B = buckets.shape
    T = min(threads, B)
    Bt = B // T
    # arrange: block j holds bucket (t*Bt + Bt-1-j) for every slice t.
    # The permutation is STRUCTURED (slice-major with reversed in-slice
    # order), so it lowers as reshape + flip + transpose — pure data
    # movement, no lane-axis gather (a jnp.take over the B axis walked
    # the whole (3LW, B) bucket array element-wise: ~138 MB of gather
    # traffic per pass at the 2^24 config).
    # arr[j, (c*L + i)*W + w, t] = buckets[c, i, w, t*Bt + Bt-1-j]
    # Mosaic block constraint: the per-block row count must be a multiple
    # of 8 (sublane tile); 3LW isn't for odd-limb profiles (e.g. the
    # 21-limb 13-bit BN254), so each block is row-padded to rw8 and the
    # padding rows are never touched.
    rw = 3 * L * W
    rw8 = -(-rw // 8) * 8
    sel = buckets.reshape(rw, T, Bt)[:, :, ::-1]
    arr = jnp.moveaxis(sel, 2, 0)                           # (Bt, rw, T)
    if rw8 != rw:
        arr = jnp.pad(arr, ((0, 0), (0, rw8 - rw), (0, 0)))
    arr = arr.reshape(Bt * rw8, T)
    in_spec = pl.BlockSpec((rw8, T), lambda j: (j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rw8, T), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    m, g = pl.pallas_call(
        functools.partial(_pbpr_kernel, curve=curve, L=L, W=W, Bt=Bt,
                          goff=rw8),
        grid=(Bt,),
        out_shape=(jax.ShapeDtypeStruct((rw8, T), I32),
                   jax.ShapeDtypeStruct((rw8, T), I32)),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((2 * rw8, T), I32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(arr)
    return (m[:rw].reshape(3, L, W, T), g[:rw].reshape(3, L, W, T))
