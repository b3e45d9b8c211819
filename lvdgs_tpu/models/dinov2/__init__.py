from .model import DINOv2Config, init_params, dinov2_forward
