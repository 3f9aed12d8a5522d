from geo_polygonize_ray.functions.agg import bucketed_groupby

__all__ = ["bucketed_groupby"]
