from .model import MASt3RConfig, init_params, mast3r_forward
from .matching import fast_reciprocal_nns
