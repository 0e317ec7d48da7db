"""Basis computation: position components (greedy PCA / SPLOCS) and
constraint-projection components (POD / blockwise PCA) with hyper-reduction
interpolation-point selection (DEIM / block-DEIM / geometric)."""

from animsnapbases_tpu.bases.pca import PositionComponents
from animsnapbases_tpu.bases.constraints import ConstraintComponents
