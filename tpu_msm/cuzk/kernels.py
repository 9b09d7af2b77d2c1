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


FORCE_INTERPRET = False
"""Set True to force interpreter-mode kernels even when the process's
default backend is the TPU — needed when lowering for explicit CPU
devices (e.g. the multi-chip dryrun's virtual mesh) in a process where
the axon plugin already initialized the TPU backend, so
`jax.default_backend()` cannot flip to "cpu" anymore."""


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return FORCE_INTERPRET or jax.default_backend() != "tpu"


# v5e has 128 MB of VMEM; the default 16 MB scoped limit is far too small
# for the live set of a 12-mul complete-add body at wide blocks.
_TPU_COMPILER_PARAMS = None if jax.default_backend() != "tpu" else     pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _COMPILER_PARAMS():
    # resolved at trace time: interpret-mode calls must not carry Mosaic
    # compiler params (module-level default_backend() alone is stale in
    # the FORCE_INTERPRET scenario above)
    return None if _interpret() else _TPU_COMPILER_PARAMS


@functools.lru_cache(maxsize=None)
def _kfn(kernel, **kw):
    """Memoized kernel partials: jax caches kernel-to-jaxpr tracing and
    the Mosaic lowering by FUNCTION IDENTITY, so handing pallas_call a
    fresh functools.partial per call-site re-traces and re-lowers the
    identical kernel every time. With the group loop statically
    unrolled (pipeline_pallas.py) that multiplied host lowering by G —
    ~17 min at the 2^24 config's 16 groups. One interned partial per
    (kernel, static-arg) tuple restores the cache hits."""
    return functools.partial(kernel, **kw)


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
        _kfn(_encode_kernel, curve=curve, L=L, S=S),
        grid=(V // bv,),
        out_shape=jax.ShapeDtypeStruct((L, S, V), I32),
        in_specs=[spec], out_specs=spec,
        input_output_aliases={0: 0},
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(x3)
    return out.reshape(L, n)


# ---------------------------------------------------------------------------
# Prefix scan over the sorted point stream (the SMVP core)
# ---------------------------------------------------------------------------


def _scan_kernel(sx_ref, sy_ref, sg_ref, o_ref, carry_ref, *,
                 curve: CurveParams, L: int, K: int, f8: int,
                 packed: bool = False):
    r = pl.program_id(0)
    S = 8

    @pl.when(r == 0)
    def _():
        zero = sg_ref[0:S, 0:f8].astype(jnp.int32) * 0
        one = int_to_limbs(curve.r_mod_p, L, curve.log_limb_size)
        for i in range(L):
            carry_ref[i * S:(i + 1) * S, :] = zero
            carry_ref[(L + i) * S:(L + i + 1) * S, :] = zero + one[i]
            carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] = zero

    # K stream rows per grid step (static inner unroll): amortizes the
    # per-step costs (grid dispatch, scratch round-trip, DMA ramp) over
    # K sequential point-adds — at large n the scan's grid depth R is
    # the pipeline's longest sequential chain, so per-step overhead is
    # multiplied by R/K, not R.
    acc = rows.ProjRows(
        [carry_ref[i * S:(i + 1) * S, :] for i in range(L)],
        [carry_ref[(L + i) * S:(L + i + 1) * S, :] for i in range(L)],
        [carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] for i in range(L)])
    for j in range(K):
        sl = slice(j * f8, (j + 1) * f8)
        if packed:
            # stream coords arrive as int32 WORDS packing limb pairs
            # (limb 2w in the low 16 bits, 2w+1 high — the row-gather
            # upstream costs ~35 ns/row latency-bound, so halving the
            # gathered element count halves its cost; same bytes as the
            # int16 form). Canonical limbs < 2^w <= 2^13 are
            # non-negative, so the mask/shift unpack is exact.
            def unpack(ref, i):
                w = ref[(i // 2) * S:(i // 2 + 1) * S, sl]
                v = (w >> 16) if (i & 1) else w
                return v & jnp.int32(0xFFFF)
            x = [unpack(sx_ref, i) for i in range(L)]
            y = [unpack(sy_ref, i) for i in range(L)]
        else:
            # stream coords arrive int16 (canonical limbs < 2^w <= 2^13
            # fit exactly) — HALF the HBM traffic of the pipeline's
            # biggest input; widen to i32 lanes for the limb math
            x = [sx_ref[i * S:(i + 1) * S, sl].astype(jnp.int32)
                 for i in range(L)]
            y = [sy_ref[i * S:(i + 1) * S, sl].astype(jnp.int32)
                 for i in range(L)]
        sign = sg_ref[:, sl]                      # (8, f8) int32 0/1
        yneg = rows.neg_rows(y, curve, 2)         # digit < 0 -> add -P
        y = rows.select_rows(sign != 0, yneg, y)
        acc = rows.pmadd_rows(acc, x, y, curve)
        # tbuf leaves the kernel int16: padd/pmadd output limbs lie in
        # (-2^w, 2^(w+1)) (canonical-mul limbs < 2^w, one lazy add/sub
        # with k*p <= 2p limbwise), so w <= 13 fits int16 exactly —
        # HALVING the pipeline's biggest custom-call output stream
        # (3L x n lanes). The int32 running value stays in carry_ref.
        o16 = o_ref.dtype
        for i in range(L):
            o_ref[i * S:(i + 1) * S, sl] = acc.x[i].astype(o16)
            o_ref[(L + i) * S:(L + i + 1) * S, sl] = acc.y[i].astype(o16)
            o_ref[(2 * L + i) * S:(2 * L + i + 1) * S, sl] = \
                acc.z[i].astype(o16)
    for i in range(L):
        carry_ref[i * S:(i + 1) * S, :] = acc.x[i]
        carry_ref[(L + i) * S:(L + i + 1) * S, :] = acc.y[i]
        carry_ref[(2 * L + i) * S:(2 * L + i + 1) * S, :] = acc.z[i]


def prefix_scan(sx8: jnp.ndarray, sy8: jnp.ndarray, sign8: jnp.ndarray,
                curve: CurveParams, f8: int, unroll: int = 4,
                packed: bool = False) -> jnp.ndarray:
    """Running prefix sums of the sorted, sign-folded point stream.

    Full-sublane layout: per grid step the kernel consumes (8, F8)
    tiles per limb (anything narrower wastes VPU sublanes — a (2, C)
    limb row runs at 25% occupancy). The caller lays the per-step
    stream of F = Wg*C lanes out as (8, F8 = F/8) and stacks steps on
    the last axis:

    sx8, sy8: (L*8, R*F8) Montgomery coords — or, with packed=True,
        ((L/2)*8, R*F8) int32 words each packing a limb PAIR (low limb
        in the low 16 bits); block r covers stream positions
        [r*F, (r+1)*F) of the window group.
    sign8: (8, R*F8) negative-digit flags, same layout.
    unroll: stream rows folded per grid step (clipped to a power-of-two
        divisor of R and to ~64 MB of VMEM blocks).
    Returns tbuf (3*L*8, R*F8): inclusive per-lane prefix points.
    """
    L8, n8 = sx8.shape
    if packed:
        L8 *= 2
    L = L8 // 8
    R = n8 // f8
    K = max(1, min(unroll, R))
    while R % K:
        K -= 1
    # VMEM bound: in (2x) + out (3x) + sign blocks of K*f8 lanes x L8
    # rows x 4 B; keep under ~64 MB so double-buffering fits the 128 MB
    while K > 1 and (6 * L8 * K * f8 * 4) > (64 << 20):
        K //= 2
    # Mosaic lane-blocking: a non-full block's lane extent must tile the
    # array by 128s; K=1 keeps the pre-unroll (always-valid) shape
    while K > 1 and (K * f8) % 128 and K * f8 != n8:
        K //= 2
    kf8 = K * f8
    in_rows = L8 // 2 if packed else L8
    in_spec = pl.BlockSpec((in_rows, kf8), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    sg_spec = pl.BlockSpec((8, kf8), lambda r: (0, r),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * L8, kf8), lambda r: (0, r),
                            memory_space=pltpu.VMEM)
    # int16 output: prefix-point limbs are bounded by (-2^w, 2^(w+1))
    # (see _scan_kernel) — exact in 16 bits for every shipped profile
    # (w <= 13); the int32 fallback keeps hypothetical wide-limb curves
    # correct.
    odt = jnp.int16 if curve.log_limb_size <= 13 else I32
    tbuf = pl.pallas_call(
        _kfn(_scan_kernel, curve=curve, L=L, K=K, f8=f8, packed=packed),
        grid=(R // K,),
        out_shape=jax.ShapeDtypeStruct((3 * L8, n8), odt),
        in_specs=[in_spec, in_spec, sg_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((3 * L8, f8), I32)],
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(sx8, sy8, sign8.astype(jnp.int16))
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
        _kfn(_globalize_kernel, curve=curve, L=L8x3 // 24),
        grid=(R,),
        out_shape=jax.ShapeDtypeStruct((L8x3, n8), I32),
        in_specs=[t_spec, s_spec],
        out_specs=t_spec,
        input_output_aliases={0: 0},
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(tbuf, s8)


# ---------------------------------------------------------------------------
# Batched complete point add (and subtract via pre-negated y)
# ---------------------------------------------------------------------------


def _padd_kernel(p_ref, q_ref, o_ref, *, curve: CurveParams, L: int):
    def pt(ref):
        # inputs may arrive int16 (gathered tbuf / col-prefix slices)
        return rows.ProjRows([ref[i].astype(I32) for i in range(L)],
                             [ref[L + i].astype(I32) for i in range(L)],
                             [ref[2 * L + i].astype(I32) for i in range(L)])
    s = rows.padd_rows(pt(p_ref), pt(q_ref), curve)
    dt = o_ref.dtype
    for i in range(L):
        o_ref[i] = s.x[i].astype(dt)
        o_ref[L + i] = s.y[i].astype(dt)
        o_ref[2 * L + i] = s.z[i].astype(dt)


def padd_batch(p: jnp.ndarray, q: jnp.ndarray, curve: CurveParams,
               block: int = 512, alias_p: bool = False,
               out_dtype=None) -> jnp.ndarray:
    """Complete projective add on stacked batches.

    p, q: (3, L, *batch) int32 OR int16 lazy limbs (values < 4p; int16
    requires the (-2^w, 2^(w+1)) limb bound every kernel in this file
    maintains). Returns the same shape, dtype `out_dtype` (default
    int32). Batch is flattened and blocked over an (8, block) grid; lanes
    are padded to a multiple of 8*block with zeros (harmless: garbage in,
    garbage out in dropped lanes). alias_p=True reuses p's buffer for the
    output (donation) — only when the caller is done with p AND dtypes
    match; saves a full result allocation on big streams (the gbuf
    globalize pass)."""
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
        _kfn(_padd_kernel, curve=curve, L=L),
        grid=((Fp // 8) // bv,),
        out_shape=jax.ShapeDtypeStruct((3 * L, 8, Fp // 8),
                                       out_dtype or I32),
        in_specs=[spec, spec], out_specs=spec,
        input_output_aliases={0: 0} if alias_p else {},
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(p3, q3)
    return out.reshape(3 * L, Fp)[:, :F].reshape(3, L, *batch_shape)


def pneg_stacked(p: jnp.ndarray, curve: CurveParams, k: int = 4) -> jnp.ndarray:
    """Point negation on a stacked (3, L, ...) batch: y -> k*p - y.
    Pure elementwise — fast in plain XLA, no kernel needed. Preserves an
    int16 input dtype (k*p limbs < 2^w and y limbs > -2^(w+1) keep the
    result inside 16 bits for w <= 13)."""
    L = p.shape[1]
    kp = jnp.array(int_to_limbs(k * curve.p, L, curve.log_limb_size),
                   p.dtype).reshape(L, *([1] * (p.ndim - 2)))
    return jnp.stack([p[0], kp - p[1], p[2]])


def psub_batch(p: jnp.ndarray, q: jnp.ndarray, curve: CurveParams,
               block: int = 512, out_dtype=None) -> jnp.ndarray:
    """p - q on stacked batches (q.y must be < 4p)."""
    return padd_batch(p, pneg_stacked(q, curve), curve, block,
                      out_dtype=out_dtype)


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
        _kfn(_pdbl_kernel, curve=curve, L=L),
        grid=((Fp // 8) // bv,),
        out_shape=jax.ShapeDtypeStruct((3 * L, 8, Fp // 8), I32),
        in_specs=[spec], out_specs=spec,
        compiler_params=_COMPILER_PARAMS(),
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
# Signed-digit decomposition (stage 1b) as ONE kernel
# ---------------------------------------------------------------------------


def _digits_kernel(hw_ref, o_ref, *, s: int, W: int, H: int):
    """Window extraction + signed-digit conversion, fused. The reference
    does this per scalar in convert_...metal:94-121; the XLA twin
    (cuzk/decompose.py) spends ~9 small ops per window — at W=20 that is
    ~180 dispatched ops on a host-dispatch-bound runtime (benches/probe13:
    ~47 us/op execution), so the whole unrolled chain lives in one kernel
    here."""
    mask = jnp.int32((1 << s) - 1)
    full = jnp.int32(1 << s)
    half = jnp.int32(1 << (s - 1))
    h = [hw_ref[i] for i in range(H)]
    carry = None
    for w in range(W):
        bit = w * s
        i, off = bit >> 4, bit & 15
        val = h[i] >> off if off else h[i]
        if off and i + 1 < H:
            val = val | (h[i + 1] << (16 - off))
        val = val & mask
        if carry is not None:
            val = val + carry
        ge = val >= half
        o_ref[w] = val - jnp.where(ge, full, 0)
        carry = ge.astype(I32)


def decompose_digits(halfwords: jnp.ndarray, s: int, W: int,
                     block: int = 1024) -> jnp.ndarray:
    """(H, n) int32 16-bit halfwords -> (W, n) int32 signed digits in
    [-2^(s-1), 2^(s-1)] with cross-window carry (cuzk/decompose.py twin,
    bit-identical; tests/test_pallas.py)."""
    H, n = halfwords.shape
    S = 8
    V = n // S
    bv = min(block, V)
    if V % bv:
        raise ValueError(f"n={n} not blockable by {S}x{bv}")
    h3 = halfwords.reshape(H, S, V)
    in_spec = pl.BlockSpec((H, S, bv), lambda g: (0, 0, g),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W, S, bv), lambda g: (0, 0, g),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kfn(_digits_kernel, s=s, W=W, H=H),
        grid=(V // bv,),
        out_shape=jax.ShapeDtypeStruct((W, S, V), I32),
        in_specs=[in_spec], out_specs=out_spec,
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(h3)
    return out.reshape(W, n)


# ---------------------------------------------------------------------------
# In-kernel row-band helpers (shared by the fused scan/reduction kernels)
# ---------------------------------------------------------------------------


def _inf_rows(curve: CurveParams, L: int, W: int, rows: int, lanes: int
              ) -> jnp.ndarray:
    """(rows, lanes) int32 whose row r carries limb i of the projective
    infinity (0 : 1m : 0) for row order (coord, limb, window):
    r = (c*L + i)*W + w. Rows >= 3*L*W (alignment padding) read 0."""
    ridx = jax.lax.broadcasted_iota(I32, (rows, lanes), 0)
    c = ridx // (L * W)
    li = (ridx // W) % L
    one = int_to_limbs(curve.r_mod_p, L, curve.log_limb_size)
    val = jnp.zeros((rows, lanes), I32)
    for i, v in enumerate(one):
        if v:
            val = jnp.where(li == i, jnp.int32(v), val)
    return jnp.where(c == 1, val, 0)


def _pt_bands(ref, L: int, W: int, base: int = 0) -> rows.ProjRows:
    """ProjRows view of a (c*L + i)*W row-band layout ref."""
    def coord(c):
        return [ref[base + (c * L + i) * W:base + (c * L + i + 1) * W, :]
                for i in range(L)]
    return rows.ProjRows(coord(0), coord(1), coord(2))


def _widen_rows(p: rows.ProjRows) -> rows.ProjRows:
    """int16-stored point rows -> int32 for the limb arithmetic."""
    w = lambda rs: [r.astype(I32) for r in rs]
    return rows.ProjRows(w(p.x), w(p.y), w(p.z))


def _write_bands(ref, p: rows.ProjRows, L: int, W: int, base: int = 0):
    for c, coord in enumerate((p.x, p.y, p.z)):
        for i in range(L):
            ref[base + (c * L + i) * W:base + (c * L + i + 1) * W, :] = coord[i]


# ---------------------------------------------------------------------------
# Exclusive column-prefix scan (the S array of the bucket extraction)
# ---------------------------------------------------------------------------


def _colprefix_kernel(in_ref, o_ref, v_ref, sh_ref, *, curve: CurveParams,
                      L: int, Wg: int, levels: int):
    """Grid step 0 shifts the column totals right by one (exclusive
    seed); steps 1..levels run one Hillis-Steele prefix level each —
    shift distance 2^(j-1) selected by static branch, ONE shared
    complete-add body. Replaces log2(C) separate padd_batch dispatches
    (the reference has no analogue: its per-subtask transpose is serial,
    transpose.metal:27-43).

    The right-shift-by-k is pltpu.roll + an iota mask, NOT a
    concatenate of lane slices: Mosaic's vector_extract_strided_slice
    rule check-fails (`limits[i] <= dim(i)`) on the sub-tile slice
    inf[:, :k] inside an scf.if on v5e (bisected in benches/probe14.py;
    the pbpr kernel's left-shift form happens to be fine)."""
    j = pl.program_id(0)
    rows8, C = v_ref.shape
    inf = _inf_rows(curve, L, Wg, rows8, C)
    lane = jax.lax.broadcasted_iota(I32, (rows8, C), 1)

    @pl.when(j == 0)
    def _():
        v_ref[:] = jnp.where(lane < 1, inf, pltpu.roll(in_ref[:], 1, 1))

    for lv in range(levels):
        k = 1 << lv

        @pl.when(j == lv + 1)
        def _(k=k):
            sh_ref[:] = jnp.where(lane < k, inf, pltpu.roll(v_ref[:], k, 1))

    @pl.when(j > 0)
    def _():
        out = rows.padd_rows(_pt_bands(v_ref, L, Wg),
                             _pt_bands(sh_ref, L, Wg), curve)
        _write_bands(v_ref, out, L, Wg)

    @pl.when(j == levels)
    def _():
        # same (-2^w, 2^(w+1)) limb bound as the scan kernel's output
        # (every level's point is a padd_rows result) -> int16 out
        o_ref[:] = v_ref[:].astype(o_ref.dtype)


def col_prefix(coltot: jnp.ndarray, curve: CurveParams) -> jnp.ndarray:
    """(3, L, Wg, C) per-column totals -> (3, L, Wg, C) EXCLUSIVE prefix
    points along the last axis (S[c] = sum of columns < c), one kernel."""
    _, L, Wg, C = coltot.shape
    levels = max(C.bit_length() - 1, 1)
    rw = 3 * L * Wg
    rows8 = -(-rw // 8) * 8
    # accepts the scan kernel's int16 tbuf slice; internal accumulation
    # runs int32 in scratch, and the result leaves int16 again (the
    # padd_rows limb bound is level-independent)
    a = coltot.reshape(rw, C).astype(I32)
    if rows8 != rw:
        a = jnp.pad(a, ((0, rows8 - rw), (0, 0)))
    odt = jnp.int16 if curve.log_limb_size <= 13 else I32
    spec = pl.BlockSpec((rows8, C), lambda j: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kfn(_colprefix_kernel, curve=curve, L=L, Wg=Wg, levels=levels),
        grid=(levels + 1,),
        out_shape=jax.ShapeDtypeStruct((rows8, C), odt),
        in_specs=[spec], out_specs=spec,
        scratch_shapes=[pltpu.VMEM((rows8, C), I32),
                        pltpu.VMEM((rows8, C), I32)],
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(a)
    return out[:rw].reshape(3, L, Wg, C)


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

    bucket = _widen_rows(pt_rows(b_ref, 0))
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


def _pbpr_full_kernel(b_ref, o_ref, mg_ref, sh_ref, *, curve: CurveParams,
                      L: int, W: int, Bt: int, T: int, goff: int):
    """The COMPLETE parallel bucket-points reduction in one kernel.

    Grid phases (sequential, scratch-carried):
      [0, Bt)                stage 1 (cuZK Alg.4, pbpr.metal:33-96):
                             m += bucket_slice_j; g += m.
      [Bt, Bt+bits)          phase A: suffix Hillis-Steele scan of BOTH
                             halves over the T lanes. After it,
                             m-lane j = S_j = sum_{t>=j} m_t and
                             g-lane 0 = g_tot = sum_t g_t.
      Bt+bits                mask: m lane 0 -> inf, g lanes>0 -> inf.
      (Bt+bits, Bt+2bits]    phase B: same scan body again. m-lane 0
                             becomes sum_{j>=1} S_j, which equals the
                             weighted sum WS = sum_t t*m_t — this
                             identity replaces the reference's
                             double_and_add stage 2 (pbpr.metal:98-148)
                             with no scalar multiplication at all.
                             g-lane 0 keeps g_tot (all other
                             contributions are masked to infinity).
      [.., ..+log2(Bt))      phase C: m-half doubling -> Bt * WS.
      last                   G_w = g_tot + Bt*WS -> out lane 0.
    """
    j = pl.program_id(0)
    bits = max(T.bit_length() - 1, 0)
    dbl = max(Bt.bit_length() - 1, 0)
    rows8 = o_ref.shape[0]
    inf = _inf_rows(curve, L, W, rows8, T)

    @pl.when(j == 0)
    def _():
        mg_ref[:] = jnp.concatenate([inf, inf], axis=0)

    # ---- stage 1 ----
    @pl.when(j < Bt)
    def _():
        # buckets arrive int16 from the extraction stage (psub_batch
        # limb bound, pipeline_pallas.py); widen for the limb math
        bucket = _widen_rows(_pt_bands(b_ref, L, W))
        m = rows.padd_rows(_pt_bands(mg_ref, L, W), bucket, curve)
        g = rows.padd_rows(_pt_bands(mg_ref, L, W, goff), m, curve)
        _write_bands(mg_ref, m, L, W)
        _write_bands(mg_ref, g, L, W, goff)

    # ---- phases A/B: suffix scan over lanes, shared body ----
    in_a = jnp.logical_and(j >= Bt, j < Bt + bits)
    in_b = jnp.logical_and(j > Bt + bits, j <= Bt + 2 * bits)
    in_scan = jnp.logical_or(in_a, in_b)
    level = jnp.where(in_a, j - Bt, j - Bt - bits - 1)
    inf2 = jnp.concatenate([inf, inf], axis=0)
    for lv in range(bits):
        k = 1 << lv

        @pl.when(jnp.logical_and(in_scan, level == lv))
        def _(k=k):
            sh_ref[:] = jnp.concatenate(
                [mg_ref[:, k:], inf2[:, :k]], axis=1)

    @pl.when(in_scan)
    def _():
        # one complete-add body covers both halves: row-bands of m and g
        # are concatenated on the sublane axis (2W-window points)
        def pt2(ref):
            def coord(c):
                return [jnp.concatenate(
                    [ref[(c * L + i) * W:(c * L + i + 1) * W, :],
                     ref[goff + (c * L + i) * W:
                         goff + (c * L + i + 1) * W, :]], axis=0)
                    for i in range(L)]
            return rows.ProjRows(coord(0), coord(1), coord(2))

        out = rows.padd_rows(pt2(mg_ref), pt2(sh_ref), curve)
        for c, coord in enumerate((out.x, out.y, out.z)):
            for i in range(L):
                mg_ref[(c * L + i) * W:(c * L + i + 1) * W, :] = coord[i][:W]
                mg_ref[goff + (c * L + i) * W:
                       goff + (c * L + i + 1) * W, :] = coord[i][W:]

    # ---- mask between A and B ----
    @pl.when(j == Bt + bits)
    def _():
        lane = jax.lax.broadcasted_iota(I32, (rows8, T), 1)
        mg_ref[0:rows8, :] = jnp.where(lane == 0, inf, mg_ref[0:rows8, :])
        mg_ref[goff:goff + rows8, :] = jnp.where(
            lane == 0, mg_ref[goff:goff + rows8, :], inf)

    # ---- phase C: double the m-half log2(Bt) times ----
    start_c = Bt + 2 * bits + 1
    @pl.when(jnp.logical_and(j >= start_c, j < start_c + dbl))
    def _():
        m2 = rows.pdbl_rows(_pt_bands(mg_ref, L, W), curve)
        _write_bands(mg_ref, m2, L, W)

    # ---- final combine ----
    @pl.when(j == start_c + dbl)
    def _():
        out = rows.padd_rows(_pt_bands(mg_ref, L, W),
                             _pt_bands(mg_ref, L, W, goff), curve)
        _write_bands(o_ref, out, L, W)


def pbpr_full(buckets: jnp.ndarray, curve: CurveParams,
              threads: int) -> jnp.ndarray:
    """Whole PBPR (stages 1+2) in one pallas_call: (3, L, W, B) buckets
    (slot b = multiplier b+1) -> (3, L, W) per-window sums G_w.

    Same slice-major reversed input arrangement as pbpr_stage1 below;
    everything after stage 1 runs on scratch across extra grid steps
    (see _pbpr_full_kernel). One dispatched op replaces the ~200-op
    XLA tail (bit-decomposed Hillis-Steele + Horner) of round 1."""
    _, L, W, B = buckets.shape
    T = min(threads, B)
    Bt = B // T
    bits = max(T.bit_length() - 1, 0)
    dbl = max(Bt.bit_length() - 1, 0)
    rw = 3 * L * W
    rw8 = -(-rw // 8) * 8
    sel = buckets.reshape(rw, T, Bt)[:, :, ::-1]
    arr = jnp.moveaxis(sel, 2, 0)                           # (Bt, rw, T)
    if rw8 != rw:
        arr = jnp.pad(arr, ((0, 0), (0, rw8 - rw), (0, 0)))
    arr = arr.reshape(Bt * rw8, T)
    in_spec = pl.BlockSpec((rw8, T), lambda j: (jnp.minimum(j, Bt - 1), 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rw8, T), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kfn(_pbpr_full_kernel, curve=curve, L=L, W=W, Bt=Bt, T=T, goff=rw8),
        grid=(Bt + 2 * bits + dbl + 2,),
        out_shape=jax.ShapeDtypeStruct((rw8, T), I32),
        in_specs=[in_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2 * rw8, T), I32),
                        pltpu.VMEM((2 * rw8, T), I32)],
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(arr)
    return out[:rw].reshape(3, L, W, T)[..., 0]


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
        _kfn(_pbpr_kernel, curve=curve, L=L, W=W, Bt=Bt, goff=rw8),
        grid=(Bt,),
        out_shape=(jax.ShapeDtypeStruct((rw8, T), I32),
                   jax.ShapeDtypeStruct((rw8, T), I32)),
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((2 * rw8, T), I32)],
        compiler_params=_COMPILER_PARAMS(),
        interpret=_interpret(),
    )(arr)
    return (m[:rw].reshape(3, L, W, T), g[:rw].reshape(3, L, W, T))
