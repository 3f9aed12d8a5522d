from geo_polygonize_ray.functions.agg import bucketed_groupby, join_partitions
from geo_polygonize_ray.functions.sketch import approx_distinct

__all__ = ["bucketed_groupby", "approx_distinct"]
