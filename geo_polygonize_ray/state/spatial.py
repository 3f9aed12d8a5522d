"""Spatially-partitioned polygon sink + bbox-pruned reads.

A 100 TB polygonize run's OUTPUT is itself a big table, and downstream
consumers almost always want a spatial subset (one AOI, one map sheet).
Partitioning the sink by a regular grid over the polygon CENTROIDS turns
those reads into partition pruning: a bbox query lists the cell range it
covers, reads only those partition directories, and applies the exact
centroid filter to the (already tiny) remainder — bytes scanned scale
with the query area, not the corpus.

Built on the checkpointed manifest sink (state/manifest.py), so the
spatial layout inherits resumability (reruns skip finished cells) and
per-partition lineage.  The pruning contract is CENTROID-in-bbox (the
same ownership anchor the distributed polygonizer uses — each polygon has
exactly one centroid cell, so the pruned read is exact, never a
near-miss approximation).  Callers who need "geometry intersects bbox"
semantics should pad the query bbox by their maximum polygon radius —
the same buffered-window contract as tiled polygonization
(reference src/tiling.rs:66-77 duplication rule).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from geo_polygonize_ray.state.manifest import Manifest, write_polygons_checkpointed

SPATIAL_META = "_SPATIAL.json"


def _cell_label(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return np.char.add(
        np.char.add("c", ix.astype(np.int64).astype(str)), np.char.add("_", iy.astype(np.int64).astype(str))
    )


def write_polygons_spatial(
    ds: rd.Dataset,
    out_dir: str,
    cell_size: float,
    cx_col: str = "cx",
    cy_col: str = "cy",
    stage: str = "polygons_spatial",
    resume: bool = True,
) -> dict:
    """Consume a polygons Dataset into ``out_dir/part=c<ix>_<iy>/`` cells
    keyed by the floor-grid cell of each polygon's centroid.  Cell size is
    pinned in ``_SPATIAL.json`` so readers can't prune with a mismatched
    grid."""

    def add_cell(batch: pa.Table) -> pa.Table:
        cx = batch[cx_col].to_numpy(zero_copy_only=False)
        cy = batch[cy_col].to_numpy(zero_copy_only=False)
        ix = np.floor(cx / cell_size).astype(np.int64)
        iy = np.floor(cy / cell_size).astype(np.int64)
        return batch.append_column("_cell", pa.array(_cell_label(ix, iy)))

    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, SPATIAL_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev["cell_size"] != cell_size:
            raise ValueError(
                f"existing spatial layout at {out_dir!r} uses cell_size="
                f"{prev['cell_size']}, not {cell_size} — pick a new out_dir"
            )
    else:
        with open(meta_path, "w") as f:
            json.dump({"cell_size": cell_size, "cx_col": cx_col, "cy_col": cy_col}, f)
    return write_polygons_checkpointed(
        ds.map_batches(add_cell, batch_format="pyarrow"),
        out_dir,
        partition_col="_cell",
        stage=stage,
        resume=resume,
    )


def read_polygons_bbox(
    out_dir: str,
    bbox: tuple[float, float, float, float],
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Bbox-pruned read of a spatial layout: only partitions whose cell
    intersects ``bbox`` are opened, then the exact centroid-in-bbox filter
    runs on the survivors (half-open on the max edges, matching the
    centroid-ownership rule).  Returns a lazy Dataset."""
    with open(os.path.join(out_dir, SPATIAL_META)) as f:
        meta = json.load(f)
    cs = float(meta["cell_size"])
    cx_col, cy_col = meta["cx_col"], meta["cy_col"]
    minx, miny, maxx, maxy = bbox
    ix0, ix1 = int(np.floor(minx / cs)), int(np.floor(maxx / cs))
    iy0, iy1 = int(np.floor(miny / cs)), int(np.floor(maxy / cs))

    man = Manifest(out_dir)
    files: list[str] = []
    for key in man.completed():
        ix, iy = (int(v) for v in key[1:].split("_"))
        if ix0 <= ix <= ix1 and iy0 <= iy <= iy1:
            files.extend(man.partition_files(key))
    if not files:
        raise FileNotFoundError(
            f"no completed spatial partitions intersect bbox {bbox} under {out_dir!r}"
        )
    if columns is not None:
        # the exact filter needs the centroid columns even if the caller
        # didn't ask for them; project back after filtering
        read_cols = sorted(set(columns) | {cx_col, cy_col})
    else:
        read_cols = None

    def exact(batch: pa.Table) -> pa.Table:
        cx = batch[cx_col].to_numpy(zero_copy_only=False)
        cy = batch[cy_col].to_numpy(zero_copy_only=False)
        keep = (cx >= minx) & (cx < maxx) & (cy >= miny) & (cy < maxy)
        out = batch.filter(pa.array(keep))
        return out.select(columns) if columns is not None else out

    return rd.read_parquet(files, columns=read_cols).map_batches(
        exact, batch_format="pyarrow"
    )


def pruned_fraction(out_dir: str, bbox: tuple[float, float, float, float]) -> float:
    """Fraction of the layout's partitions a bbox read opens (diagnostic:
    bytes-proportionality evidence for tests/benchmarks)."""
    with open(os.path.join(out_dir, SPATIAL_META)) as f:
        cs = float(json.load(f)["cell_size"])
    minx, miny, maxx, maxy = bbox
    ix0, ix1 = int(np.floor(minx / cs)), int(np.floor(maxx / cs))
    iy0, iy1 = int(np.floor(miny / cs)), int(np.floor(maxy / cs))
    man = Manifest(out_dir)
    keys = list(man.completed())
    if not keys:
        return 0.0
    hit = 0
    for key in keys:
        ix, iy = (int(v) for v in key[1:].split("_"))
        if ix0 <= ix <= ix1 and iy0 <= iy <= iy1:
            hit += 1
    return hit / len(keys)
