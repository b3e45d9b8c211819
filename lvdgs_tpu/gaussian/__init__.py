from .model import (
    GaussianMap,
    MapOptimizer,
    create_map,
    seed_from_depth,
    densify_and_prune,
    prune_points,
    reset_opacity,
    reset_opacity_nonvisible,
    add_densification_stats,
    position_lr,
)
