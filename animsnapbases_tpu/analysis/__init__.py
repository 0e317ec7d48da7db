"""Analysis & diagnostics: PCA extraction figures, nonlinear-basis
reconstruction convergence, on-mesh accuracy between full and reduced
simulations, and the npy comparison tool."""

from animsnapbases_tpu.analysis.figures import (
    plots_pca,
    plots_nonlinearity_basis,
)
from animsnapbases_tpu.analysis.accuracy import (
    per_vertex_relative_l2,
    normal_angle_error,
    compute_accuracy,
)
from animsnapbases_tpu.analysis.compare import compare_npy_files
