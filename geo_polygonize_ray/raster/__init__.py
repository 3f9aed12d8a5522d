from geo_polygonize_ray.raster.codec import decode_image, encode_image, psnr
from geo_polygonize_ray.raster.phash import phash64
from geo_polygonize_ray.raster.vectorize import labels_to_linework, rgb_to_labels
from geo_polygonize_ray.raster.rasterize import rasterize_faces, rasterize_polygons

__all__ = [
    "decode_image",
    "encode_image",
    "psnr",
    "phash64",
    "labels_to_linework",
    "rgb_to_labels",
    "rasterize_faces",
    "rasterize_polygons",
]
