"""Build and drive the reference C++ Voxelyze engine for parity testing.

The reference (/root/reference/evosoro/_voxcad) is the ground truth this
framework must reproduce: its `voxelyze` CLI reads a .vxa, integrates the
mass-spring-damper lattice until the stop condition, and writes a fitness XML
(reference: voxelyzeMain/main.cpp:49-131, VX_SimGA.cpp:25-203). This module
compiles that engine out-of-tree (the reference mount is read-only) and runs
it on VXA files our `evosoro_tpu.io.vxa.write_vxa` emits, so golden-trajectory
tests can compare the two engines step-for-step on identical inputs.

Nothing here is on the TPU hot path — it is a host-side test/benchmark tool.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import time
import xml.etree.ElementTree as ET
from pathlib import Path

REFERENCE_ROOT = Path(os.environ.get("EVOSORO_REFERENCE", "/root/reference/evosoro"))
# cache path is versioned: bump the suffix when the build recipe changes
# (v2: -DUSE_ZLIB_COMPRESSION so the binary reads/writes ZLIB VXC layers)
DEFAULT_CACHE = Path(os.environ.get("EVOSORO_REF_CACHE", "/tmp/evosoro_ref_v2"))

# land_water fork has the fluid-drag model (reference: SURVEY.md §2.3)
FORKS = {"base": "_voxcad", "land_water": "_voxcad_land_water"}


def build_reference(cache_dir: Path | str = DEFAULT_CACHE, fork: str = "base",
                    timeout: int = 300) -> Path | None:
    """Compile the reference voxelyze CLI; returns the binary path or None.

    Copies the C++ tree to `cache_dir` (the reference mount is read-only),
    builds libvoxelyze with its own Makefile (-O3, reference:
    Voxelyze/Makefile:30), links main.cpp directly. Cached across calls.
    """
    cache_dir = Path(cache_dir)
    binary = cache_dir / fork / "voxelyze"
    if binary.exists():
        return binary
    src = REFERENCE_ROOT / FORKS[fork]
    if not src.is_dir() or shutil.which("g++") is None:
        return None
    dest = cache_dir / fork / "src"
    try:
        if not dest.is_dir():
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copytree(src / "Voxelyze", dest / "Voxelyze")
            shutil.copytree(src / "voxelyzeMain", dest / "voxelyzeMain")
            # the reference ships prebuilt objects/archives; drop them or
            # make considers everything up-to-date and our CFLAGS (zlib
            # codec define) never apply
            for pat in ("*.o", "*.a", "*.d"):
                for stale in (dest / "Voxelyze").rglob(pat):
                    stale.unlink()
        flags = "-O3 -Wall -std=c++11 -DUSE_ZLIB_COMPRESSION $(INCLUDE)"
        subprocess.run(
            # the %.o rule compiles with $(CXXFLAGS) (Makefile:93), which the
            # Makefile never sets; supply it (plus CFLAGS for the links) to
            # enable the zlib layer codec (guarded in VX_Object.cpp:1773)
            ["make", "-j4", f"CXXFLAGS={flags}", f"CFLAGS={flags}"],
            cwd=dest / "Voxelyze", check=True,
            capture_output=True, timeout=timeout,
        )
        lib = next((dest / "Voxelyze").glob("libvoxelyze*.a"))
        libname = lib.stem[3:]  # "voxelyze.0.9"
        subprocess.run(
            ["g++", "-O3", "-std=c++11", "-I../Voxelyze", "-I../Voxelyze/Utils",
             "main.cpp", "-L../Voxelyze", f"-l{libname}", "-lm", "-lstdc++",
             "-lz", "-o", str(binary)],
            cwd=dest / "voxelyzeMain", check=True, capture_output=True,
            timeout=timeout,
        )
    except (subprocess.SubprocessError, OSError, StopIteration):
        return None
    return binary if binary.exists() else None


def build_dump(cache_dir: Path | str = DEFAULT_CACHE, fork: str = "base",
               timeout: int = 300) -> Path | None:
    """Compile tools/ref_dump_main.cpp against the (cached) reference lib:
    a per-step full-state dump driver for bit-level parity tests."""
    cache_dir = Path(cache_dir)
    binary = cache_dir / fork / "voxelyze_dump"
    if binary.exists():
        return binary
    if build_reference(cache_dir, fork=fork, timeout=timeout) is None:
        return None
    dest = cache_dir / fork / "src"
    src_cpp = Path(__file__).parent / "ref_dump_main.cpp"
    try:
        lib = next((dest / "Voxelyze").glob("libvoxelyze*.a"))
        libname = lib.stem[3:]
        subprocess.run(
            ["g++", "-O3", "-std=c++11", f"-I{dest/'Voxelyze'}",
             f"-I{dest/'Voxelyze'/'Utils'}", str(src_cpp),
             f"-L{dest/'Voxelyze'}", f"-l{libname}", "-lm", "-lstdc++", "-lz",
             "-o", str(binary)],
            check=True, capture_output=True, timeout=timeout,
        )
    except (subprocess.SubprocessError, OSError, StopIteration):
        return None
    return binary if binary.exists() else None


def build_leafmat(cache_dir: Path | str = DEFAULT_CACHE, fork: str = "base",
                  timeout: int = 300) -> Path | None:
    """Compile tools/ref_leafmat_main.cpp against the (cached) reference
    lib: prints per-voxel GetLeafMatIndex resolutions and prsm samples for
    compound-material (dither/internal) import-parity tests."""
    cache_dir = Path(cache_dir)
    binary = cache_dir / fork / "voxelyze_leafmat"
    if binary.exists():
        return binary
    if build_reference(cache_dir, fork=fork, timeout=timeout) is None:
        return None
    dest = cache_dir / fork / "src"
    src_cpp = Path(__file__).parent / "ref_leafmat_main.cpp"
    try:
        lib = next((dest / "Voxelyze").glob("libvoxelyze*.a"))
        libname = lib.stem[3:]
        subprocess.run(
            ["g++", "-O3", "-std=c++11", f"-I{dest/'Voxelyze'}",
             f"-I{dest/'Voxelyze'/'Utils'}", str(src_cpp),
             f"-L{dest/'Voxelyze'}", f"-l{libname}", "-lm", "-lstdc++", "-lz",
             "-o", str(binary)],
            check=True, capture_output=True, timeout=timeout,
        )
    except (subprocess.SubprocessError, OSError, StopIteration):
        return None
    return binary if binary.exists() else None


def run_dump(vxa_path, max_steps: int, binary: Path | None = None,
             fork: str = "base", timeout: float = 600.0):
    """Run the dump driver; returns (times, pos[S,N,3], scale[S,N]) numpy
    arrays in the engine's voxel order (occupied cells, x-fastest scan of
    the VXC data — reference: VX_Sim.cpp Import order)."""
    import numpy as np

    binary = binary or build_dump(fork=fork)
    if binary is None:
        raise RuntimeError("dump driver unavailable")
    vxa_path = Path(vxa_path)
    with tempfile.TemporaryDirectory(prefix="voxelyze_dump_") as td:
        out = Path(td) / "dump.txt"
        subprocess.run(
            [str(binary), str(vxa_path), str(out), str(max_steps)],
            capture_output=True, timeout=timeout, check=False,
        )
        times, poss, scales = [], [], []
        for line in out.read_text().splitlines():
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split(" B ")[0].split()
            t = float(parts[1])
            nvox = int(parts[2])
            vals = np.array(parts[3:3 + 4 * nvox], dtype=np.float64)
            vals = vals.reshape(nvox, 4)
            times.append(t)
            poss.append(vals[:, :3])
            scales.append(vals[:, 3])
    return np.array(times), np.array(poss), np.array(scales)


def run_reference(vxa_path, binary: Path | None = None, fork: str = "base",
                  timeout: float = 300.0) -> dict:
    """Run the reference engine on a VXA; returns the parsed fitness dict.

    The GA block's FitnessFileName inside the VXA decides the output file
    name; we run in a scratch dir and pick up whatever XML appears. Returned
    dict maps result tags (NormFinalDist, finalDistY, ...) to floats, plus
    "cm_trace" -> (T,4) [time,x,y,z] rows and "vol_trace" -> (T,2) when the
    VXA enabled traces (reference: VX_SimGA.cpp:172-198), and "wall_time".
    """
    binary = binary or build_reference(fork=fork)
    if binary is None:
        raise RuntimeError("reference voxelyze binary unavailable")
    vxa_path = Path(vxa_path)
    with tempfile.TemporaryDirectory(prefix="voxelyze_run_") as td:
        run_dir = Path(td)
        shutil.copy(vxa_path, run_dir / vxa_path.name)
        # FitnessFileName may contain a directory component
        for sub in ("fitnessFiles",):
            (run_dir / sub).mkdir(exist_ok=True)
        t0 = time.perf_counter()
        # NOTE: main returns 1 on success (main.cpp:131) — don't check rc
        subprocess.run(
            [str(binary), "-f", vxa_path.name],
            cwd=run_dir, capture_output=True, timeout=timeout,
        )
        wall = time.perf_counter() - t0
        outputs = [
            p for p in run_dir.rglob("*.xml") if p.name != vxa_path.name
        ]
        if not outputs:
            raise RuntimeError("reference run produced no fitness XML")
        result = parse_result_xml(outputs[0])
        result["wall_time"] = wall
        return result


def parse_result_xml(path) -> dict:
    """Parse Voxelyze_Sim_Result XML (reference writer: VX_SimGA.cpp:140-203)."""
    root = ET.parse(path).getroot()
    out: dict = {}
    fit = root.find("Fitness")
    if fit is not None:
        for el in fit:
            try:
                out[el.tag] = float(el.text)
            except (TypeError, ValueError):
                pass
    cm = root.find("CMTrace")
    if cm is not None:
        rows = []
        for step in cm.findall("TraceStep"):
            rows.append([
                float(step.findtext(k, "nan"))
                for k in ("Time", "TraceX", "TraceY", "TraceZ")
            ])
        out["cm_trace"] = rows
    vol = root.find("VolumeTrace")
    if vol is not None:
        out["vol_trace"] = [
            [float(s.findtext("Time", "nan")), float(s.findtext("Volume", "nan"))]
            for s in vol.findall("TraceStep")
        ]
    return out


def measure_reference_throughput(n: int = 6, sim_time: float = 1.0,
                                 seed: int = 0) -> dict | None:
    """Measure the reference engine's single-core voxel-steps/s on the same
    randomized n³ workload bench.py uses, and persist it for bench.py's
    vs_baseline denominator. Returns the record or None if unavailable."""
    import json

    import numpy as np

    from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
    from evosoro_tpu.io.vxa import write_vxa

    binary = build_reference()
    if binary is None:
        return None
    rng = np.random.default_rng(seed)
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    sim = SimParams(stop_condition_value=sim_time, init_cm_time=0.1)
    env = EnvParams()
    with tempfile.TemporaryDirectory() as td:
        vxa = Path(td) / "bench.vxa"
        write_vxa(vxa, structure, evosoro_default_palette(), sim=sim, env=env,
                  voxel_arrays={"PhaseOffset": phase},
                  fitness_file_name="out.xml")
        res = run_reference(vxa, binary)
    # step count from the reference's own stability dt rule
    from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list

    body = build_body(structure, palette_from_list(evosoro_default_palette()),
                      phase_offset=phase)
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    steps = int(np.ceil(sim_time / dt))
    n_vox = int(np.sum(structure > 0))
    record = {
        "voxels": n_vox,
        "steps": steps,
        "wall_time": res["wall_time"],
        "voxel_steps_per_sec": n_vox * steps / res["wall_time"],
        "norm_final_dist": res.get("NormFinalDist"),
    }
    out_path = Path("/tmp/evosoro_ref_bench.json")
    out_path.write_text(json.dumps(record))
    return record


if __name__ == "__main__":
    rec = measure_reference_throughput()
    print(rec)
