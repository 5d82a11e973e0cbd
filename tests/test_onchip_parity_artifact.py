"""Enforce the committed on-chip parity artifact against the documented band.

tools/onchip_parity.py --check re-measures on the real chip; this CPU test
makes CI fail if a committed ONCHIP_PARITY.json ever exceeds the band the
README documents (<=5e-7 m/100 steps quiet scenarios, <=5e-5 m/100 steps
chaotic dynamic ones) or records a divergence.
"""

import json
from pathlib import Path

ARTIFACT = Path(__file__).resolve().parents[1] / "ONCHIP_PARITY.json"

# scenarios whose dynamics are damped/quasi-static: rounding differences do
# not amplify (Lyapunov rate < 1), so the two paths must agree tightly
QUIET = {"collision", "volume_effects", "mdl_data", "ballistic_devo"}
QUIET_BOUND = 5e-7
# chaotic dynamic scenarios: one-ulp seeds amplify at ~x6/step and saturate
# near the local oscillation amplitude (tools/onchip_parity.py docstring)
CHAOTIC_BOUND = 5e-5


def test_committed_artifact_within_band():
    rec = json.loads(ARTIFACT.read_text())
    assert rec["scenarios"], "artifact has no scenarios"
    for name, s in rec["scenarios"].items():
        bound = QUIET_BOUND if name in QUIET else CHAOTIC_BOUND
        assert s["max_abs_pos_diff_m"] <= bound, (
            f"{name}: committed on-chip drift {s['max_abs_pos_diff_m']:.3e} "
            f"exceeds documented band {bound:.0e}")
        assert not s["diverged"], f"{name}: committed artifact diverged"
        # drift must also be small relative to the motion it rides on
        assert s["max_abs_pos_diff_m"] < 0.01 * s["pos_span_m"]
