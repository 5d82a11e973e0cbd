"""Interactive sandbox (viz/sandbox.py) — the headless analog of VoxCad's
live physics view (QVX_Interfaces.h:125): step/poke/reset semantics plus the
scriptable terminal REPL."""

import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from evosoro_tpu.core.materials import build_body, palette_from_list  # noqa: E402
from evosoro_tpu.core.types import EnvParams, SimParams, \
    evosoro_default_palette  # noqa: E402
from evosoro_tpu.viz.sandbox import InteractiveSandbox, repl  # noqa: E402


def _sandbox():
    rng = np.random.default_rng(3)
    s = np.zeros((3, 3, 2), dtype=np.int32)
    s[:, :, 0] = 3
    s[:, :, 1] = 1
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    return InteractiveSandbox(body, SimParams(init_cm_time=0.0), EnvParams())


def test_step_poke_reset():
    sb = _sandbox()
    t0 = sb.time
    sb.step(5)
    assert sb.time > t0
    assert sb.steps_done == 5
    cm_before = sb.center_of_mass().copy()

    # a lateral poke imparts momentum the unpoked sim doesn't have
    # (voxels are ~1 kg at this density/size: push hard so the CoM shift
    # clears the assertion margin by orders of magnitude)
    sb2 = _sandbox().step(5)
    sb2.apply_force((1, 1, 1), (200.0, 0.0, 0.0), duration_steps=40)
    sb.step(60)
    sb2.step(60)
    assert sb2.center_of_mass()[0] > sb.center_of_mass()[0] + 1e-7
    assert np.isfinite(sb2.center_of_mass()).all()

    sb2.reset()
    assert sb2.time == 0.0
    assert sb2.steps_done == 0
    np.testing.assert_allclose(sb2.center_of_mass(), cm_before, atol=1e-3)


def test_poke_requires_occupied_voxel():
    import pytest

    rng = np.random.default_rng(3)
    s = np.zeros((3, 3, 2), dtype=np.int32)
    s[:, :, 0] = 3
    s[2, 2, 1] = 0  # a hole
    s[0, 0, 1] = 1
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    sb = InteractiveSandbox(body, SimParams(), EnvParams())
    with pytest.raises(ValueError):
        sb.apply_force((2, 2, 1), (1, 0, 0))
    sb.apply_force((0, 0, 1), (1, 0, 0))  # occupied: fine


def test_repl_scripted(tmp_path):
    sb = _sandbox()
    png = tmp_path / "frame.png"
    script = io.StringIO(
        "i\n"
        "s 5\n"
        "p 1 1 1 0 0 0.2 5\n"
        "s 10\n"
        "c\n"
        f"r {png}\n"
        "z\n"
        "bogus\n"
        "q\n"
    )
    out = io.StringIO()
    repl(sb, stdin=script, stdout=out)
    text = out.getvalue()
    assert "t=" in text and "rendered" in text and "reset." in text
    assert "unknown command" in text
    assert png.exists() and png.stat().st_size > 0
    assert sb.steps_done == 0  # the z command reset it
