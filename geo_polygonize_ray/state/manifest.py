"""Per-partition checkpoint manifest + resumable output (SURVEY.md §4.2,
north_rule: "checkpoints per-partition with lineage + throughput metrics so
any cell's trace is resumable").

Layout:
    out_dir/
      part=<key>/data-<run>-<task>.parquet   (unique per writing task; a
          partition is the UNION of its data*.parquet files — Ray Data's
          dynamic block splitting may route one partition's rows through
          several map_batches tasks, so tasks must never share a filename)
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

    def record(
        self,
        partition: str,
        input_fingerprint: str,
        rows: int,
        seconds: float,
        nbytes: int,
        files: list[str] | None = None,
    ) -> None:
        row = {
            "stage": self.stage,
            "partition": partition,
            "input_fingerprint": input_fingerprint,
            "rows": int(rows),
            "seconds": round(float(seconds), 4),
            "bytes": int(nbytes),
            "rows_per_sec": round(rows / seconds, 1) if seconds > 0 else None,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            # the exact file set making up the partition: a resume that SKIPS
            # this partition sweeps any other data file (orphans of a later
            # crashed run would otherwise double-count — a partition is the
            # union of its data*.parquet files)
            "files": sorted(files) if files is not None else None,
        }
        # single-writer append; on a cluster this is a driver-side log
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.out_dir, f"part={partition}")

    def partition_files(self, partition: str) -> list[str]:
        """All data files of a partition (the partition = their union)."""
        import glob

        return sorted(glob.glob(os.path.join(self.partition_dir(partition), "data*.parquet")))


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
    distributed: bool = True,
    partition_buckets: int | None = None,
) -> dict:
    """Consume a polygons Dataset into per-partition parquet with manifest.

    ``distributed=True`` (default): each WORKER task writes its own blocks'
    partitions to a task-unique file (atomic tmp+rename) and returns
    manifest rows; only the tiny manifest flows through the driver — the
    100 TB-correct layout.  A partition whose rows straddle several tasks
    (Ray Data's dynamic block splitting can split one map_groups output
    block) is simply the union of its files; the driver aggregates one
    manifest row per partition AFTER the whole dataset is consumed, and
    removes files from older/crashed runs so rewrites never double-count.
    ``distributed=False`` falls back to driver-side streaming (one
    concatenated file per partition).

    ``partition_buckets``: cap the number of output partitions by hashing
    the partition key into this many buckets (``part=b<k>`` directories).
    A 10^4-tile job writing one file per TILE is a tiny-file storm
    (measured: 16384 partitions cost ~7 ms each — 2/3 of the whole job);
    resume granularity coarsens to the bucket, which is the right trade
    at scale.

    A rerun with ``resume=True`` skips partitions already in the manifest
    (byte-identical output for deterministic pipelines, FIXTURES.md §6.4).
    Returns {written: [...], skipped: [...], rows: N}.
    """
    if partition_buckets:
        import numpy as _np
        import pyarrow as _pa

        nb = int(partition_buckets)

        def add_bucket_col(t: "_pa.Table", _col=partition_col, _nb=nb) -> "_pa.Table":
            key = _np.asarray(t[_col].to_pylist())
            if key.dtype.kind in "iu":
                mixed = key.astype(_np.uint64) * _np.uint64(0x9E3779B97F4A7C15)
                b = ((mixed >> _np.uint64(33)) % _np.uint64(_nb)).astype(_np.int64)
            else:
                import pandas as _pd

                b = (_pd.util.hash_array(key) % _nb).astype(_np.int64)
            labels = _np.array([f"b{int(x)}" for x in b])
            return t.append_column("_part_bucket", _pa.array(labels))

        ds = ds.map_batches(add_bucket_col, batch_format="pyarrow")
        partition_col = "_part_bucket"
    if distributed:
        return _write_distributed(ds, out_dir, partition_col, stage, resume)
    return _write_driver_side(ds, out_dir, partition_col, stage, resume)


def _write_partition_atomic(out_dir: str, stage: str, key: str, table, run_id: str) -> dict:
    import os as _os
    import time as _time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    t0 = _time.perf_counter()
    pdir = _os.path.join(out_dir, f"part={key}")
    _os.makedirs(pdir, exist_ok=True)
    # task-unique name: concurrent tasks holding rows of the SAME partition
    # (dynamic block splitting) must not clobber each other
    fname = f"data-{run_id}-{_uuid.uuid4().hex[:8]}.parquet"
    tmp = _os.path.join(pdir, f".{fname}.tmp")
    final = _os.path.join(pdir, fname)
    _pq.write_table(table, tmp)
    _os.replace(tmp, final)
    return {
        "partition": key,
        "input_fingerprint": fingerprint_table(table),
        "rows": int(table.num_rows),
        "seconds": round(_time.perf_counter() - t0, 4),
        "bytes": int(_os.path.getsize(final)),
        "file": fname,
    }


def _write_distributed(ds, out_dir, partition_col, stage, resume) -> dict:
    import hashlib as _hashlib
    import uuid as _uuid

    import numpy as np
    import pyarrow as pa

    import ray

    man = Manifest(out_dir, stage)
    done_rows = man.completed() if resume else {}
    done = set(done_rows)
    # sweep orphans of crashed runs from partitions we are about to SKIP: a
    # run that crashed after writing some data files into an already-complete
    # partition left files outside the manifest-recorded set; a plain skip
    # would let readers double-count them (round-2 ADVICE, manifest.py:247)
    for key, row in done_rows.items():
        recorded = row.get("files")
        if recorded is None:
            continue  # legacy row without a file set: cannot sweep safely
        keep = set(recorded)
        for f in man.partition_files(key):
            if os.path.basename(f) not in keep:
                os.remove(f)
    done_ref = ray.put(done)
    run_id = _uuid.uuid4().hex[:8]

    def write_block(batch: "pa.Table") -> "pa.Table":
        skip = ray.get(done_ref)
        rows = {"partition": [], "input_fingerprint": [], "rows": [], "seconds": [], "bytes": [], "skipped": [], "file": []}
        if batch.num_rows == 0:
            return pa.table(
                {
                    "partition": pa.array([], pa.string()),
                    "input_fingerprint": pa.array([], pa.string()),
                    "rows": pa.array([], pa.int64()),
                    "seconds": pa.array([], pa.float64()),
                    "bytes": pa.array([], pa.int64()),
                    "skipped": pa.array([], pa.bool_()),
                    "file": pa.array([], pa.string()),
                }
            )
        keys = np.asarray(batch[partition_col].to_pylist())
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))
        ends = np.concatenate([starts[1:], [len(sk)]])
        for s, e in zip(starts, ends):
            key = str(sk[s])
            if key in skip:
                rows["partition"].append(key)
                rows["input_fingerprint"].append("")
                rows["rows"].append(0)
                rows["seconds"].append(0.0)
                rows["bytes"].append(0)
                rows["skipped"].append(True)
                rows["file"].append("")
                continue
            part = batch.take(pa.array(order[s:e]))
            if "_part_bucket" in part.column_names:
                # the bucketing helper column is writer plumbing, not data:
                # persisting it would make the checkpoint schema depend on
                # the partition_buckets knob (round-2 ADVICE, manifest.py:123)
                part = part.drop_columns(["_part_bucket"])
            m = _write_partition_atomic(out_dir, stage, key, part, run_id)
            rows["partition"].append(m["partition"])
            rows["input_fingerprint"].append(m["input_fingerprint"])
            rows["rows"].append(m["rows"])
            rows["seconds"].append(m["seconds"])
            rows["bytes"].append(m["bytes"])
            rows["skipped"].append(False)
            rows["file"].append(m["file"])
        return pa.table(
            {
                "partition": pa.array(rows["partition"], pa.string()),
                "input_fingerprint": pa.array(rows["input_fingerprint"], pa.string()),
                "rows": pa.array(rows["rows"], pa.int64()),
                "seconds": pa.array(rows["seconds"], pa.float64()),
                "bytes": pa.array(rows["bytes"], pa.int64()),
                "skipped": pa.array(rows["skipped"], pa.bool_()),
                "file": pa.array(rows["file"], pa.string()),
            }
        )

    # .to_pandas() here means every file write has already succeeded; only
    # then do cleanup + manifest recording, so a crashed run records nothing
    # (its orphan files are swept on the next run's rewrite of the partition)
    mdf = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    skipped = set(mdf.loc[mdf.get("skipped", np.array([], dtype=bool)), "partition"]) if len(mdf) else set()
    written, rows_total = [], 0
    if len(mdf):
        w = mdf[~mdf["skipped"]]
        run_marker = f"data-{run_id}-"
        for key, g in w.groupby("partition"):
            # sweep files not from this run (previous runs / crashed runs)
            for f in man.partition_files(str(key)):
                if not os.path.basename(f).startswith(run_marker):
                    os.remove(f)
            # one aggregated manifest row per partition (union of its files)
            fp = _hashlib.sha1(
                "".join(sorted(g["input_fingerprint"])).encode()
            ).hexdigest()[:16] if len(g) > 1 else g["input_fingerprint"].iloc[0]
            n_rows = int(g["rows"].sum())
            man.record(
                str(key),
                fp,
                n_rows,
                max(float(g["seconds"].max()), 1e-9),
                int(g["bytes"].sum()),
                files=list(g["file"]),
            )
            written.append(str(key))
            rows_total += n_rows
    return {"written": sorted(written), "skipped": sorted(skipped), "rows": rows_total}


def _write_driver_side(
    ds,
    out_dir: str,
    partition_col: str,
    stage: str,
    resume: bool,
) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    man = Manifest(out_dir, stage)
    done = man.completed() if resume else {}
    for key, row in done.items():  # sweep crashed-run orphans on skip
        recorded = row.get("files")
        if recorded is None:
            continue
        keep = set(recorded)
        for f in man.partition_files(key):
            if os.path.basename(f) not in keep:
                os.remove(f)
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
            if "_part_bucket" in part.column_names:
                part = part.drop_columns(["_part_bucket"])
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
        for f in man.partition_files(key):  # sweep prior runs' files
            if f != final:
                os.remove(f)
        os.replace(tmp, final)  # atomic publish
        nbytes = os.path.getsize(final)
        man.record(
            key,
            fingerprint_table(table),
            table.num_rows,
            time.perf_counter() - t0,
            nbytes,
            files=[os.path.basename(final)],
        )
        rows_total += table.num_rows
        out_written.append(key)

    return {"written": sorted(out_written), "skipped": sorted(skipped), "rows": rows_total}
