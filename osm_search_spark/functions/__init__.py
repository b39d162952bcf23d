from . import cells, geodesy, geometry, text  # noqa: F401
