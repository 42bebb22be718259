"""Per-partition lineage manifests — the reference's lastRun.txt, done right.

The reference appends every output filename to a single lastRun.txt
and deletes the whole previous harvest at the start of the next run
(S8/S9/J2: app.py:69,164; s3_operations.py:31-43) — crash mid-run and
everything re-runs.  Here each output partition is written atomically
(temp file + rename) together with a JSON manifest row carrying its
lineage: partition id, input fragment ids, row count, checksum, wall
time.  Resume = anti-join of planned partitions against completed
manifests (the J2 anti-lookup, inverted to *skip* finished work), so a
killed run re-does only missing partitions and the final output is
byte-identical (SURVEY.md §5.2 #5-#6).

Partition ids derive from INPUT fragment paths, not task ids, so they
are stable across cluster sizes and retries (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def partition_id(fragment: str) -> str:
    """Stable partition id from an input fragment path/name."""
    base = os.path.basename(fragment)
    h = hashlib.sha256(fragment.encode()).hexdigest()[:8]
    return f"{os.path.splitext(base)[0]}-{h}"


def table_checksum(tbl: pa.Table) -> str:
    """Order-sensitive content checksum of a partition table."""
    h = hashlib.sha256()
    for batch in tbl.to_batches():
        for col in batch.columns:
            for buf in col.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()[:16]


class ManifestSink:
    """Resumable partitioned parquet sink.

    write_partition() is idempotent: a partition whose manifest exists
    is skipped (and its prior stats returned).  Files land as
    ``part-<pid>.parquet`` via temp+rename; manifests as
    ``_manifest/<pid>.json`` written last, so a crash between the two
    re-does the partition (rename overwrite keeps output consistent).
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.mdir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.mdir, exist_ok=True)

    def manifest_path(self, pid: str) -> str:
        return os.path.join(self.mdir, f"{pid}.json")

    def is_done(self, pid: str) -> bool:
        return os.path.exists(self.manifest_path(pid))

    def completed(self) -> dict[str, dict]:
        out = {}
        for name in os.listdir(self.mdir):
            if name.endswith(".json"):
                with open(os.path.join(self.mdir, name)) as f:
                    m = json.load(f)
                out[m["partition_id"]] = m
        return out

    def plan(self, fragments: list[str]) -> list[tuple[str, str]]:
        """(fragment, pid) pairs still to do — the manifest anti-join."""
        return [(frag, pid) for frag in fragments
                for pid in [partition_id(frag)] if not self.is_done(pid)]

    def write_partition(self, pid: str, tbl: pa.Table,
                        inputs: list[str] | None = None) -> dict:
        if self.is_done(pid):
            with open(self.manifest_path(pid)) as f:
                return json.load(f)
        t0 = time.time()
        from ..sources import lance_io
        final = os.path.join(self.out_dir, f"part-{pid}{lance_io.shard_ext()}")
        tmp = final + ".tmp"
        lance_io.write_shard(tbl, tmp)       # parquet here; Lance when importable
        os.replace(tmp, final)               # atomic on one filesystem
        manifest = {
            "partition_id": pid,
            "path": final,
            "inputs": inputs or [],
            "rows": tbl.num_rows,
            "checksum": table_checksum(tbl),
            "wall_sec": round(time.time() - t0, 4),
        }
        mtmp = self.manifest_path(pid) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, self.manifest_path(pid))
        return manifest

    def orphans(self) -> list[str]:
        """Output files with no manifest (crashed partial writes)."""
        from ..sources import lance_io
        ext = lance_io.shard_ext()
        done = {f"part-{pid}{ext}" for pid in self.completed()}
        out = []
        for name in os.listdir(self.out_dir):
            if name.endswith(ext) and name not in done:
                out.append(os.path.join(self.out_dir, name))
        return out

    def clean_orphans(self) -> int:
        orphans = self.orphans()
        for path in orphans:
            os.remove(path)
        return len(orphans)
