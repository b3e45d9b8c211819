from .ate import eval_ate, umeyama_alignment
from .rendering import eval_rendering
