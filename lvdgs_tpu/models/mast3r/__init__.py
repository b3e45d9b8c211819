from .model import MASt3RConfig, init_params, mast3r_forward
from .matching import fast_reciprocal_nns
from .cloud_opt import (
    SparseGAConfig,
    batched_triangulate,
    matches_to_depths,
    sparse_global_alignment,
    sparse_scene_optimizer,
    tsdf_refine_depths,
)
