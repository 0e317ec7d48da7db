"""Snapshot ingestion and preprocessing for both pipelines: vertex positions
(PCA/SPLOCS inputs) and constraint projections (POD/DEIM inputs)."""

from animsnapbases_tpu.snapshots.pipeline import (
    import_sequence_to_h5,
    preprocess_mesh_animation,
    align_h5,
    sort_nicely,
)
from animsnapbases_tpu.snapshots.position import PositionSnapshots
from animsnapbases_tpu.snapshots.nonlinear import NonlinearSnapshots
