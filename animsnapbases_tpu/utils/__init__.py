"""Cross-cutting utilities: numerical invariant checks and phase timing."""

from animsnapbases_tpu.utils.checks import (
    sparsity_fractions,
    is_sparse,
    ranks_per_dim,
    is_linear_independent,
    utmu_orthogonality_error,
    check_matrix_properties,
)
from animsnapbases_tpu.utils.timing import PhaseTimer, log_time
