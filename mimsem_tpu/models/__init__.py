from .swe import SWEqn
