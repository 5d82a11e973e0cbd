from evosoro_tpu.core.constants import (  # noqa: F401
    DEFAULT_PRECISION,
    PREC_HIGH,
    PREC_LOW,
    PREC_MED,
    Precision,
)
from evosoro_tpu.core.collision import (  # noqa: F401
    CollisionSystem,
    attach_collision_system,
    build_collision_system,
    collision_forces,
)
from evosoro_tpu.core.materials import (  # noqa: F401
    build_body,
    calc_max_dt,
    palette_from_list,
)
from evosoro_tpu.core.rollout import (  # noqa: F401
    RolloutResult,
    center_of_mass,
    init_state,
    num_steps_for,
    rollout,
)
from evosoro_tpu.core.step import sim_step  # noqa: F401
from evosoro_tpu.core.types import (  # noqa: F401
    EnvParams,
    Material,
    MaterialPalette,
    SimParams,
    SimState,
    VoxelBody,
    evosoro_default_palette,
)
