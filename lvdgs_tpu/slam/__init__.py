from . import state, tracking, mapping
