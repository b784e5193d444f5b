"""Pallas TPU kernels for the hot paths.

The reference's hot loops are native Eigen code inside qpOASES and the
condensing recursions (SURVEY.md §3); here the hot path is the batched ADMM
iteration, and the win on TPU is arithmetic-intensity: the factorized KKT
operator is small enough to live in VMEM for the whole iteration loop, so a
fused kernel reads it from HBM once instead of once per iteration.
"""

from .admm_kernel import (fused_admm_box, fused_admm_box_shared,
                          fused_admm_general, fused_admm_general_shared,
                          xla_admm_box)

__all__ = ["fused_admm_box", "fused_admm_box_shared",
           "fused_admm_general", "fused_admm_general_shared",
           "xla_admm_box"]
