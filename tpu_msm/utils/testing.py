"""Host helpers bridging the python-int oracle and planar device arrays.

Used by the test pyramid (SURVEY.md §4) to move Jacobian points between
the pure-int oracle representation and Montgomery-form planar limb arrays
— the role ark<->limb conversions play in the reference's tests
(e.g. tests/curve/jacobian_add_2007_b1.rs random points in Montgomery-limb
form, decoded via utils/mont_reduction.rs raw_reduction)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..constants import CurveParams
from .limbs_conversion import ints_to_planar, planar_to_ints

JacInt = Tuple[int, int, int]


def jac_to_planar_mont(pts: Sequence[JacInt], curve: CurveParams
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Oracle Jacobian int tuples -> three (L, n) Montgomery planar arrays.
    Canonical infinity (z == 0) maps to all-zero coordinates."""
    xs = ints_to_planar([curve.to_mont(p[0]) if p[2] != 0 else 0 for p in pts],
                        curve.num_limbs, curve.log_limb_size)
    ys = ints_to_planar([curve.to_mont(p[1]) if p[2] != 0 else 0 for p in pts],
                        curve.num_limbs, curve.log_limb_size)
    zs = ints_to_planar([curve.to_mont(p[2]) for p in pts],
                        curve.num_limbs, curve.log_limb_size)
    return xs, ys, zs


def planar_mont_to_jac(x, y, z, curve: CurveParams) -> List[JacInt]:
    """Inverse of jac_to_planar_mont (Montgomery decode on host)."""
    xi = planar_to_ints(np.asarray(x), curve.log_limb_size)
    yi = planar_to_ints(np.asarray(y), curve.log_limb_size)
    zi = planar_to_ints(np.asarray(z), curve.log_limb_size)
    return [(curve.from_mont(a), curve.from_mont(b), curve.from_mont(c))
            for a, b, c in zip(xi, yi, zi)]


def affine_to_planar_mont(pts: Sequence[Tuple[int, int]], curve: CurveParams
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Affine int pairs -> two (L, n) Montgomery planar arrays."""
    xs = ints_to_planar([curve.to_mont(p[0]) for p in pts],
                        curve.num_limbs, curve.log_limb_size)
    ys = ints_to_planar([curve.to_mont(p[1]) for p in pts],
                        curve.num_limbs, curve.log_limb_size)
    return xs, ys
