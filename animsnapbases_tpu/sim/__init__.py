"""Projective-dynamics simulation runtime.

Struct-of-arrays constraint groups + batched projection kernels + prefactored
global solves, replacing the reference's object-per-constraint design
(``projective_dynamics/Constraint_projections.py``, ``Simulators.py``) with
jit-compiled functional steps."""

from animsnapbases_tpu.sim.model import DeformableModel
from animsnapbases_tpu.sim.solver import Solver
from animsnapbases_tpu.sim.reduced import AnimSnapBasesSolver
from animsnapbases_tpu.sim.diff import DiffReducedSim, fit_scales
