"""GeoJSON I/O (reference S1/S2: examples/polygonize.rs:36-102, src/wasm.rs).

Reader walks Feature/FeatureCollection/Geometry documents recursively and
extracts linework exactly like the reference's ``extract_lines``
(src/polygonizer.rs:265-288): LineString kept, MultiLineString exploded,
Polygon -> exterior + interiors, Multi*/GeometryCollection recursive, Points
dropped.  Writer emits polygons as a FeatureCollection with null properties
(the reference drops properties too, examples/polygonize.rs:79-88).

These functions are driver-side conveniences for conformance fixtures; bulk
data flows through Parquet/Lance (sources/table.py).  ``read_geojson_dataset``
wraps the parse into a Ray Dataset for pipeline use.
"""

from __future__ import annotations

import json

import numpy as np


def _extract_lines_from_geometry(geom: dict, out: list[np.ndarray]) -> None:
    t = geom.get("type")
    if t == "LineString":
        out.append(np.asarray(geom["coordinates"], dtype=np.float64))
    elif t == "MultiLineString":
        for ls in geom["coordinates"]:
            out.append(np.asarray(ls, dtype=np.float64))
    elif t == "Polygon":
        for ring in geom["coordinates"]:
            out.append(np.asarray(ring, dtype=np.float64))
    elif t == "MultiPolygon":
        for poly in geom["coordinates"]:
            for ring in poly:
                out.append(np.asarray(ring, dtype=np.float64))
    elif t == "GeometryCollection":
        for g in geom.get("geometries", []):
            _extract_lines_from_geometry(g, out)
    # Point / MultiPoint dropped (src/polygonizer.rs:286)


def read_geojson_lines(path_or_str: str) -> list[np.ndarray]:
    """GeoJSON document -> linework list ((N,2) float arrays)."""
    if path_or_str.lstrip().startswith("{"):
        doc = json.loads(path_or_str)
    else:
        with open(path_or_str) as f:
            doc = json.load(f)
    out: list[np.ndarray] = []
    t = doc.get("type")
    if t == "FeatureCollection":
        for feat in doc.get("features", []):
            if feat.get("geometry"):
                _extract_lines_from_geometry(feat["geometry"], out)
    elif t == "Feature":
        if doc.get("geometry"):
            _extract_lines_from_geometry(doc["geometry"], out)
    else:
        _extract_lines_from_geometry(doc, out)
    return out


def polygons_to_geojson(polys) -> str:
    """list[Polygon] -> FeatureCollection string (properties: null, like
    examples/polygonize.rs:79-88)."""
    feats = []
    for p in polys:
        rings = [[[float(x), float(y)] for x, y in zip(p.shell_x, p.shell_y)]]
        for hx, hy in zip(p.holes_x, p.holes_y):
            rings.append([[float(x), float(y)] for x, y in zip(hx, hy)])
        feats.append(
            {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": rings}, "properties": None}
        )
    return json.dumps({"type": "FeatureCollection", "features": feats}, indent=2)


def polygonize_geojson(path_or_str: str, node_input: bool = False, snap_grid_size: float = 1e-10) -> str:
    """The CLI-equivalent path (examples/polygonize.rs): GeoJSON in ->
    polygonize -> GeoJSON FeatureCollection out."""
    from geo_polygonize_ray.local import polygonize_lines

    lines = read_geojson_lines(path_or_str)
    polys = polygonize_lines(lines, node_input=node_input, snap_grid_size=snap_grid_size)
    return polygons_to_geojson(polys)


def read_geojson_dataset(path: str, plane_id: str = "plane-0"):
    """GeoJSON file -> Ray linework Dataset (for the distributed pipeline)."""
    import ray.data as rd

    from geo_polygonize_ray.sources.fixtures import linework_table

    return rd.from_arrow(linework_table(read_geojson_lines(path), plane_id))
