"""Interactive session: runtime constraint toggles, side fixing, stepping,
pick-and-drag — the headless control panel."""

import numpy as np

from animsnapbases_tpu.demos.interactive import InteractiveSession
from test_demos_cli import small_args


def make_session(tmp_path, **kw):
    params, args = small_args(tmp_path, **kw)
    return InteractiveSession(args, "Cloth", params=params)


def test_runtime_constraint_toggles(tmp_path):
    s = make_session(tmp_path, vert_bending_constraint=False)
    assert s.model.has_group("edge_spring")
    assert not s.model.has_group("verts_bending")
    s.set_constraint("vert_bending", True, wi=0.2)
    assert s.model.has_group("verts_bending")
    s.set_constraint("edge", False)
    assert not s.model.has_group("edge_spring")
    stats = s.stats()
    assert stats["vertices"] == 36
    assert "tris_strain_constraints" in stats


def test_session_steps_and_reset(tmp_path):
    s = make_session(tmp_path, vert_bending_constraint=False)
    s.fix_side("top")
    p0 = s.model.positions.copy()
    s.step(8)
    assert s.solver.frame == 8
    assert not np.allclose(s.model.positions, p0)
    s.reset()
    assert s.solver.frame == 0
    np.testing.assert_allclose(s.model.positions, p0)


def test_pick_drag_moves_vertex(tmp_path):
    s = make_session(tmp_path, vert_bending_constraint=False,
                     is_gravity_active=False)
    s.fix_side("top")
    s.step(1)
    project = lambda pos: pos[:, :2]
    down, move = s.mouse_handlers(project)
    target = 0
    down.handle_click(*s.model.positions[target, :2], ctrl=True)
    before = s.model.positions[target].copy()
    move.handle_move(s.model.positions[target, 0] + 2.0,
                     s.model.positions[target, 1])
    s.step(3)
    after = s.model.positions[target]
    assert after[0] > before[0]  # dragged in +x
    down.handle_release()
