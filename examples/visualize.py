"""Render a soft robot rollout to PNG + animated GIF.

The capability analog of watching a .vxa in VoxCad (reference:
README.md:120-140, VoxCad/VXS_SimGLView.cpp) — but headless: record a
trajectory on the accelerator, then raster the deformed surface mesh.

Usage:
    python examples/visualize.py [path/to/robot.vxa] [out_dir]
Defaults to a random 6x6x6 robot when no VXA is given.
"""

import os
import sys

import _bootstrap  # noqa: F401
import numpy as np

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.envs.drag import attach_mesh_drag
from evosoro_tpu.viz import record_trajectory, render_state, save_animation


def main():
    vxa_path = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "viz_out"
    os.makedirs(out_dir, exist_ok=True)

    materials = evosoro_default_palette()
    if vxa_path:
        from evosoro_tpu.io.vxa import load_vxa

        doc = load_vxa(vxa_path)
        body, sim, env = doc.build_body(), doc.sim, doc.env
        materials = doc.materials
    else:
        rng = np.random.default_rng(0)
        structure = rng.integers(0, 5, size=(6, 6, 6)).astype(np.int32)
        structure[3, 3, 0] = 3
        phase = rng.uniform(-1, 1, size=(6, 6, 6))
        body = build_body(
            structure, palette_from_list(materials), phase_offset=phase
        )
        sim = SimParams(stop_condition_value=0.6, init_cm_time=0.1)
        env = EnvParams()

    body = attach_mesh_drag(body)  # renderer reuses the physics surface mesh
    dt = calc_max_dt(body) * sim.dt_frac
    num_steps = int(float(sim.stop_condition_value) / float(dt))
    every = max(1, num_steps // 60)  # ~60 frames

    print(f"recording {num_steps} steps (dt={float(dt):.2e}s)...")
    traj = record_trajectory(body, sim, env, num_steps, dt=dt, every=every)

    png = os.path.join(out_dir, "final_state.png")
    render_state(body, traj.final_state, path=png, materials=materials)
    gif = os.path.join(out_dir, "rollout.gif")
    save_animation(body, traj, gif, materials=materials)
    print(f"wrote {png} and {gif}")


if __name__ == "__main__":
    main()
