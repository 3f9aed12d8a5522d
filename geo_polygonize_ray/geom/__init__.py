from geo_polygonize_ray.geom import kernels, robust

__all__ = ["kernels", "robust"]
