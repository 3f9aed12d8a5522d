"""Table read indirection (SURVEY.md §7.0).

The north-star input is a Lance table of image+caption tiles; ``pylance``
cannot be installed in this offline sandbox, so Parquet with the exact
``input_hint`` schema stands in.  ``read_table`` prefers Lance when the
package is importable so the same code runs against real Lance storage on a
cluster.
"""

from __future__ import annotations

import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def read_table(path: str, *, columns: list[str] | None = None, **kwargs):
    """-> ray.data.Dataset from Lance (if available) or Parquet."""
    import ray.data as rd

    try:
        import lance  # noqa: F401

        return rd.read_lance(path, columns=columns, **kwargs)
    except ImportError:
        return rd.read_parquet(path, columns=columns, **kwargs)
