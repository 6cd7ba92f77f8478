from . import state, step
