from . import rasterizer
