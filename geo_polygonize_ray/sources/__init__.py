from geo_polygonize_ray.sources.fixtures import (
    generate_image_table,
    grid_lines,
    random_lines,
)
from geo_polygonize_ray.sources.table import read_table

__all__ = ["generate_image_table", "grid_lines", "random_lines", "read_table"]
