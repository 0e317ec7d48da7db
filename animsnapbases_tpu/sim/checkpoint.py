"""Simulator checkpoint / resume.

The reference checkpoints only via pipeline file artifacts (SURVEY §5.4);
long reduced runs on TPU need a resumable simulator state as well: positions,
velocities, frame counter, masses and fixed flags (the latter two determine
the prepared global matrix, so a resumed solver re-prepares)."""

from __future__ import annotations

import numpy as np


def save_sim_state(path: str, solver) -> None:
    model = solver.model
    np.savez(
        path,
        positions=model.positions,
        velocities=model.velocities,
        mass=model.mass,
        fixed_flags=model.fixed_flags,
        frame=np.asarray(solver.frame),
    )


def load_sim_state(path: str, solver) -> None:
    """Restore state into the solver's model and mark it dirty (the global
    matrix depends on masses/fixed flags and is re-prepared on next step)."""
    data = np.load(path)
    model = solver.model
    model.positions = data["positions"].copy()
    model.velocities = data["velocities"].copy()
    model.mass = data["mass"].copy()
    model.fixed_flags = data["fixed_flags"].copy()
    solver.frame = int(data["frame"])
    solver.set_dirty()
