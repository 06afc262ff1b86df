from .sharding import element_sharding, replicated, make_mesh
