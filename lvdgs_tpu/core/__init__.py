from . import lie, camera, losses, config, log
