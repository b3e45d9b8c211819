from .mesh import make_mesh
from .dp_mapping import make_sharded_mapping_step
