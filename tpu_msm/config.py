"""MSM pipeline configuration and the static window schedule.

Analogue of the reference's MetalMSMConfig (metal_msm.rs:16-28) plus its
hardcoded window/scale-factor schedules (metal_msm.rs:661-691), re-cast as
one dataclass (SURVEY.md §5 "Config": "a single dataclass config (limb
layout, window schedule, mesh shape) + autotune cache"). All fields are
static at trace time — one compiled program per (n, config), cached by the
pipeline (fixing the reference's per-call pipeline rebuild,
metal_msm.rs:693)."""

from __future__ import annotations

import dataclasses

from .constants import BN254_S12, CurveParams


@dataclasses.dataclass(frozen=True)
class MSMConfig:
    """Static parameters of one compiled MSM pipeline.

    window_size (s): signed-window width; num_windows = ceil(scalar_bits/s)
        and buckets = 2^(s-1) per window exactly as metal_msm.rs:83-85 +
        smvp.metal:36 (half the columns, thanks to signed digits).
    columns (C): SMVP column count — the point stream is laid out
        column-major (R rows x C columns) and reduced by a sequential
        segmented scan over rows, vectorized over (subtask_group x C).
    pbpr_threads (T): bucket-reduction split — T slices of consecutive
        buckets per window, the cuZK Alg.4 m/g split (pbpr.metal:33-96).
    subtask_group (Wg): windows processed per device pass, bounding peak
        memory like the reference's 4-subtasks-per-dispatch chunking
        (metal_msm.rs:458-459).
    unroll: unrolled (fused) Montgomery muls in the hot scan body; rolled
        elsewhere for small graphs. None (default) resolves by backend at
        trace time: unrolled on TPU, scan-form elsewhere — XLA-CPU's
        compiler recurses so deeply on the fully unrolled limb graphs of
        the wide profiles (30-limb BLS12-377) that it overflows even
        multi-GB compile-thread stacks; the rolled form is bit-identical
        (tests/test_lazy.py) and compiles in seconds.
    dbl_mode: exceptional-case strategy in jac_add ("cond" | "select").
    backend: "pallas" (Mosaic kernels, cuzk/pipeline_pallas.py — the
        production TPU path), "xla" (pure-jnp reference path,
        cuzk/pipeline.py), or "auto" (pallas on TPU, xla elsewhere).
    """

    curve: CurveParams = BN254_S12
    window_size: int = 13
    columns: int = 256
    pbpr_threads: int = 128
    subtask_group: int = 4
    unroll: bool | None = None
    dbl_mode: str = "cond"
    backend: str = "auto"
    # GLV endomorphism decomposition (tpu_msm/glv.py, cuzk/glv.py): split
    # each scalar over the curve's cube-root-of-unity endomorphism so the
    # pipeline runs 2n points x ~half the windows. RETIRED as a default
    # (r5, VERDICT r4 weak-#6): with the r4/r5 pipeline the
    # stream-proportional stages (sort, row gather, prefix scan — ~85%
    # of device time at 2^20) do num_windows * stream_lanes work, and
    # GLV makes that (eff//s + 1) * 2n = 18n at s=16 vs 16n without —
    # +12% before the split's own cost. The r3 on-device measurement
    # agrees (2^20: 1,560 ms glv vs 1,274 off). It can only win on a
    # pipeline dominated by per-window costs (B-proportional extract /
    # PBPR), which this formulation has already shrunk to ~5%. Kept
    # functional (tests/test_glv.py) for curve parity and future
    # bucket-heavy profiles.
    glv: bool = False
    # Window-group iteration strategy on the pallas backend: "fori"
    # (lax.fori_loop with dynamic slices — ONE traced body regardless of
    # G, the default) or "unroll" (static python loop — host lowering,
    # remote-compile cost, and executable size all scale with
    # num_groups). fori was device-validated in r4: EXACT at 2^16 and
    # FASTER than the unrolled form (64.0 vs 112.4 ms) with the compile
    # down from the G-scaled worst case that blew the r3 driver budget
    # (BENCH_r03 rc=124). lax.SCAN around pallas calls wedges this
    # runtime's first execution (see pipeline_pallas.py); fori lowers to
    # a while-op instead and does not.
    group_loop: str = "fori"
    # Points per device pass. Window sums are additive in the point set,
    # so larger inputs run as several passes of one compiled program and
    # combine on host with W point-adds — bounding HBM high-water (the
    # prefix buffer alone is 3*L*4 bytes/point) the way the reference
    # bounds launches by chunking subtasks (metal_msm.rs:458-471).
    max_points_per_pass: int = 1 << 23

    def __post_init__(self):
        s = self.window_size
        if not (2 <= s <= 16):
            raise ValueError("window_size must be in [2, 16]")
        if self.columns & (self.columns - 1):
            raise ValueError("columns must be a power of two")
        if self.pbpr_threads & (self.pbpr_threads - 1):
            raise ValueError("pbpr_threads must be a power of two")
        B = self.half_columns
        if self.pbpr_threads > B:
            raise ValueError("pbpr_threads must divide the bucket count")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError("backend must be auto | xla | pallas")
        if self.group_loop not in ("unroll", "fori"):
            raise ValueError("group_loop must be unroll | fori")
        # top window must not overflow under signed-digit carry
        top_bits = self.effective_scalar_bits - s * (self.num_windows - 1)
        if top_bits >= s and not self.glv:
            # (the glv window formula below guarantees top_bits < s)
            raise ValueError("window_size incompatible with scalar width")

    @property
    def unroll_resolved(self) -> bool:
        """Trace-time unroll decision (see `unroll` above). Lazy jax
        import keeps `tpu_msm.config` importable host-only."""
        if self.unroll is not None:
            return self.unroll
        import jax
        return jax.default_backend() == "tpu"

    @property
    def glv_params(self):
        """Derived GLV constants for this curve (tpu_msm/glv.py)."""
        from . import glv
        return glv.derive(self.curve)

    @property
    def effective_scalar_bits(self) -> int:
        """Bit width the window decomposition must cover: the scalar
        modulus width, or under GLV the split-magnitude bound + 1
        headroom bit (|k_i| <= max_abs < 2^max_bits = 2^(eff-1), which
        the carry-safety argument in cuzk/decompose.signed_digits
        needs)."""
        if self.glv:
            return self.glv_params.max_bits + 1
        return self.curve.scalar_bits

    @property
    def num_windows(self) -> int:
        """ceil(scalar_bits / s) — num_subtasks in the reference
        (metal_msm.rs:83-85). Under GLV: eff//s + 1, which equals the
        ceil except when s divides eff — there the extra window absorbs
        the signed-digit carry out of a full top window (magnitudes are
        only bounded by 2^(eff-1), not by a modulus with known top
        bits)."""
        if self.glv:
            return self.effective_scalar_bits // self.window_size + 1
        return -(-self.curve.scalar_bits // self.window_size)

    @property
    def half_columns(self) -> int:
        """Buckets per window: 2^(s-1) (signed windows fold the bucket
        space in half — smvp.metal:36)."""
        return 1 << (self.window_size - 1)

    @property
    def num_groups(self) -> int:
        return -(-self.num_windows // self.subtask_group)

    @property
    def padded_windows(self) -> int:
        return self.num_groups * self.subtask_group


def default_config(n: int, curve: CurveParams = BN254_S12) -> MSMConfig:
    """Static window/shape schedule by input size — the analogue of the
    reference's size schedule (metal_msm.rs:661-691), seeded from it and
    retuned for the TPU formulation (see utils/window.py for the cost
    model and benches/ for measured points). A measured autotune result
    for this exact (device, curve, n) — utils/window.py autotune() —
    overrides the static schedule."""
    try:
        from .utils.window import cached_config
        tuned = cached_config(n, curve)
        if tuned is not None:
            return tuned
    except Exception:
        pass
    if n < (1 << 10):
        return MSMConfig(curve=curve, window_size=8, columns=32,
                         pbpr_threads=16, subtask_group=8)
    if n < (1 << 14):
        return MSMConfig(curve=curve, window_size=10, columns=256,
                         pbpr_threads=64, subtask_group=8)
    if n < (1 << 18):
        return MSMConfig(curve=curve, window_size=13, columns=2048,
                         pbpr_threads=256, subtask_group=4)
    # >= 2^18: the wide-window profile measured fastest on v5e in r3
    # (2^18: s=16 182 ms vs s=13 200; 2^20: s=16 1274 ms vs s=15 1381
    # vs s=14 1669; 2^22: s=16 5012 ms vs s=14 6624 ms) — W drops to
    # 16 and every window-proportional stage shrinks with it. Wg=2/4
    # re-measured WORSE at 2^20 (1349/1336 ms) — keep Wg=1.
    # One 2^23 pass OOMs a 16 GB v5e (sort double buffers + the
    # points-major row table + per-group stream peak ~15 GB,
    # RESOURCE_EXHAUSTED measured r3); 2^22-point passes halve every
    # stream-proportional buffer and pipeline behind the h2d overlap.
    return MSMConfig(curve=curve, window_size=16, columns=8192,
                     pbpr_threads=512, subtask_group=1,
                     max_points_per_pass=1 << 22)
