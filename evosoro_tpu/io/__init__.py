"""IO: VXA (VoxCad XML) round-trips for reference interop."""

from evosoro_tpu.io.vxa import (  # noqa: F401
    VXADocument,
    load_vxa,
    read_fitness_xml,
    write_vxa,
)
