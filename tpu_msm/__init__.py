"""tpu_msm — a TPU-native multi-scalar multiplication framework.

Brand-new JAX/XLA/Pallas implementation of variable-base MSM over BN254 G1
(and BLS12-377 G1) with the capabilities of zkmopro/gpu-acceleration
(Metal MSM v2): the cuZK sparse-matrix Pippenger formulation with signed
scalar windows, bit-exact against Arkworks v0.4.x `G::msm` semantics.

Public API (analogue of `metal_variable_base_msm`, metal_msm.rs:642-695):

    from tpu_msm import tpu_variable_base_msm
    result = tpu_variable_base_msm(points, scalars)   # -> Jacobian int tuple
"""

from .constants import (BLS12_377, BLS12_377_F12, BN254, BN254_F13, CURVES,
                        CurveParams)

__version__ = "0.1.0"

__all__ = [
    "BN254",
    "BN254_F13",
    "BLS12_377",
    "BLS12_377_F12",
    "CURVES",
    "CurveParams",
    "tpu_variable_base_msm",
    "MSMPipeline",
    "MSMConfig",
    "to_affine",
    "batch_inverse",
]


def __getattr__(name):
    # Lazy imports keep `import tpu_msm` cheap (no jax import) for host-only
    # uses like the constants module and the pure-python oracle.
    if name in ("tpu_variable_base_msm", "MSMPipeline", "MSMConfig"):
        from .cuzk import pipeline

        return getattr(pipeline, name)
    if name in ("to_affine", "batch_inverse"):
        from .ops import inverse

        return getattr(inverse, name)
    raise AttributeError(name)
