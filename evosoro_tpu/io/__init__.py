"""IO: VXA (VoxCad XML) round-trips for reference interop."""

from evosoro_tpu.io.vxa import (  # noqa: F401
    VXADocument,
    load_vxa,
    read_fitness_xml,
    write_vxa,
)
from evosoro_tpu.io.mesh_io import (  # noqa: F401
    export_deformed_mesh,
    read_stl,
    write_obj,
    write_stl,
)
