from geo_polygonize_ray.state.manifest import Manifest, write_polygons_checkpointed

__all__ = ["Manifest", "write_polygons_checkpointed"]
