from .model import GroundingDINOConfig, init_params, groundingdino_forward
