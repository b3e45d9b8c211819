from .ply import save_gaussians_ply, load_gaussians_ply
from .checkpoint import save_checkpoint, load_checkpoint
