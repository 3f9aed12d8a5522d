from geo_polygonize_ray.local.polygonize import LocalPolygonizer, Polygon, polygonize_lines

__all__ = ["LocalPolygonizer", "Polygon", "polygonize_lines"]
