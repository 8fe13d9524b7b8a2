from .load_obj import read_obj
from .mesh import Geometry, build_geometry
from .normals import recompute_normals

__all__ = ["read_obj", "Geometry", "build_geometry", "recompute_normals"]
