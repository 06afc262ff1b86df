from .sharding import (element_sharding, replicated, make_mesh, make_mesh2,
                       choose_tiling, tile_perm, auto_mesh)
