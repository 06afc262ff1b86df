from .forms import SpaceOps
from . import solvers
