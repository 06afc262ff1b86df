from .topology import Topology
from .cubed_sphere import cubed_sphere_mesh, RAD_SPHERE
from .box import periodic_box_mesh
from .geometry import Geometry, build_geometry
