"""Visualization: the VoxCad-GUI analog (off the optimization path).

The reference ships a Qt4/OpenGL editor-visualizer (`VoxCad/`, ~7.4k LoC;
`VXS_SimGLView.cpp` renders voxels colored by material/state) that is not on
the evolve/evaluate path (SURVEY.md §1). Here the same capability is a
headless renderer: deformed-surface-mesh snapshots of any `SimState` to PNG,
rollout trajectories to animated GIFs, and mesh export via `io.mesh_io` —
all driven from recorded device arrays, no GUI toolkit — plus an
interactive sandbox session (`InteractiveSandbox` / `python -m
evosoro_tpu.viz.sandbox design.vxa`): step/run/poke/reset with live
rendering, the physics-view analog of the reference GUI."""

from evosoro_tpu.viz.marching import (  # noqa: F401
    marching_tetrahedra,
    smooth_structure_mesh,
)
from evosoro_tpu.viz.render import (  # noqa: F401
    material_colors,
    render_state,
    save_animation,
)
from evosoro_tpu.viz.sandbox import InteractiveSandbox  # noqa: F401
from evosoro_tpu.viz.trajectory import record_trajectory  # noqa: F401
