from . import flow, interpolant, solvers
from .flow import decode, encode, training_loss
from .solvers import odeint, odeint_adaptive, odeint_fixed

__all__ = [
    "flow",
    "interpolant",
    "solvers",
    "training_loss",
    "decode",
    "encode",
    "odeint",
    "odeint_fixed",
    "odeint_adaptive",
]
