"""TPU-friendly numerical kernels: branch-free small-matrix decompositions,
segment-sum sparse application, and snapshot-POD linear algebra."""

from animsnapbases_tpu.ops.svd3 import (
    jacobi_eigh3,
    jacobi_eigh2,
    svd3x3,
    svd2x2,
    polar_rotation3x3,
    top_mode_rows,
)
from animsnapbases_tpu.ops.segment import (
    coo_matvec,
    coo_matvec_cols,
    segment_sum_3d,
)
from animsnapbases_tpu.ops.podlinalg import snapshot_pod
