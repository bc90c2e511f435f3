"""Hand-written Pallas TPU kernels for the hot ops.

Every kernel here has a pure-XLA twin in ``oclcomputervision_tpu.ops``
(the always-available fallback and oracle) and ships with
interpret-mode tests so the suite runs without a TPU.
"""

from oclcomputervision_tpu.ops.pallas.histeq_pallas import (
    hist256_pallas,
    apply_lut_pallas,
    histeq_global_pallas,
)

__all__ = ["hist256_pallas", "apply_lut_pallas", "histeq_global_pallas"]
