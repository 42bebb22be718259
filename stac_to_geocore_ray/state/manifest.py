"""Per-partition lineage manifests — the reference's lastRun.txt, done right.

The reference appends every output filename to a single lastRun.txt
and deletes the whole previous harvest at the start of the next run
(S8/S9/J2: app.py:69,164; s3_operations.py:31-43) — crash mid-run and
everything re-runs.  Here each output partition is written together
with a JSON manifest row carrying its lineage: partition id, input
fragment ids, row count, checksum, wall time.  Resume = anti-join of
planned partitions against completed manifests (the J2 anti-lookup,
inverted to *skip* finished work), so a killed run re-does only
missing partitions and the final output is byte-identical
(SURVEY.md §5.2 #5-#6).

Partition ids derive from INPUT fragment paths, not task ids, so they
are stable across cluster sizes and retries (SURVEY.md §7.4).

Filesystem protocol (round 3): all I/O goes through ``pyarrow.fs`` so
the sink runs unchanged against local disk or an object store.  Two
commit protocols, selected by the filesystem's capabilities:

- **Local disk**: temp file + ``os.replace`` rename — atomic on one
  filesystem, guards against partial writes of both data and manifest.
- **Object store (no atomic rename — S3 etc.)**: WRITE-THEN-MARKER.
  The data object is PUT under its final name directly (object-store
  PUTs are all-or-nothing: the object is either fully visible or
  absent, there are no partial objects to guard against), and the
  manifest marker is PUT last.  Completion is defined by manifest
  presence — exactly the invariant the local protocol provides — so a
  crash between the two leaves an orphan data object that
  ``clean_orphans`` removes and resume re-does.  No rename is ever
  issued on a non-local filesystem (tests/test_manifest.py asserts
  ``os.replace`` is never touched on that path).
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
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


def _is_local(fs) -> bool:
    from pyarrow.fs import LocalFileSystem
    return isinstance(fs, LocalFileSystem)


class ManifestSink:
    """Resumable partitioned parquet sink over any ``pyarrow.fs``.

    write_partition() is idempotent: a partition whose manifest exists
    is skipped (and its prior stats returned).  Files land as
    ``part-<pid>.parquet``; manifests as ``_manifest/<pid>.json``
    written LAST, so a crash between the two re-does the partition.
    On local disk both writes are temp+rename; on object stores both
    are direct single PUTs (see module docstring).

    ``out_dir`` may be a plain path, a ``file://`` URI, or an
    ``s3://bucket/prefix`` URI; alternatively pass an explicit
    ``filesystem`` + fs-local path (how the tests exercise the
    object-store protocol via a SubTreeFileSystem).
    """

    def __init__(self, out_dir: str, filesystem=None):
        from ..sources.lance_io import resolve_fs
        if filesystem is None:
            self.fs, self.root = resolve_fs(out_dir)
        else:
            self.fs, self.root = filesystem, out_dir
        self.local = _is_local(self.fs)
        self.out_dir = out_dir                # original spelling, for repr
        self.mdir = posixpath.join(self.root, "_manifest")
        self.fs.create_dir(self.mdir, recursive=True)

    def manifest_path(self, pid: str) -> str:
        return posixpath.join(self.mdir, f"{pid}.json")

    def _exists(self, path: str) -> bool:
        from pyarrow.fs import FileType
        return self.fs.get_file_info(path).type != FileType.NotFound

    def _read_json(self, path: str) -> dict:
        with self.fs.open_input_stream(path) as f:
            return json.loads(f.read().decode())

    def is_done(self, pid: str) -> bool:
        return self._exists(self.manifest_path(pid))

    def _listdir(self, path: str) -> list[str]:
        from pyarrow.fs import FileSelector
        infos = self.fs.get_file_info(FileSelector(path, recursive=False))
        return [i.path for i in infos]

    def completed(self) -> dict[str, dict]:
        out = {}
        for path in self._listdir(self.mdir):
            if path.endswith(".json"):
                m = self._read_json(path)
                out[m["partition_id"]] = m
        return out

    def plan(self, fragments: list[str]) -> list[tuple[str, str]]:
        """(fragment, pid) pairs still to do — the manifest anti-join."""
        return [(frag, pid) for frag in fragments
                for pid in [partition_id(frag)] if not self.is_done(pid)]

    def write_partition(self, pid: str, tbl: pa.Table,
                        inputs: list[str] | None = None,
                        quarantined: pa.Table | None = None) -> dict:
        """``quarantined``: optional dead-letter table (poison records a
        decode stage dropped); lands as ``_quarantine/<pid>.parquet``
        BEFORE the manifest marker and its count rides in the manifest,
        so no record ever disappears silently (the reference skips bad
        uploads without a trace, s3_operations.py:110-112)."""
        if self.is_done(pid):
            return self._read_json(self.manifest_path(pid))
        t0 = time.time()
        from ..sources import lance_io
        final = posixpath.join(self.root, f"part-{pid}{lance_io.shard_ext()}")
        if self.local:
            tmp = final + ".tmp"
            lance_io.write_shard(tbl, tmp)   # parquet here; Lance when importable
            os.replace(tmp, final)           # atomic on one filesystem
        else:
            # object store: single PUT, all-or-nothing by store contract
            lance_io.write_shard(tbl, final, filesystem=self.fs)
        n_quar = quarantined.num_rows if quarantined is not None else 0
        if not n_quar:
            # a prior crashed attempt may have PUT _quarantine/<pid>
            # before dying pre-manifest; this clean re-run supersedes it
            stale_q = posixpath.join(self.root, "_quarantine", f"{pid}.parquet")
            if self._exists(stale_q):
                self.fs.delete_file(stale_q)
        if n_quar:
            qdir = posixpath.join(self.root, "_quarantine")
            self.fs.create_dir(qdir, recursive=True)
            qpath = posixpath.join(qdir, f"{pid}.parquet")
            if self.local:
                qtmp = qpath + ".tmp"
                lance_io.write_shard(quarantined, qtmp)
                os.replace(qtmp, qpath)
            else:
                lance_io.write_shard(quarantined, qpath, filesystem=self.fs)
        manifest = {
            "partition_id": pid,
            "path": final,
            "inputs": inputs or [],
            "rows": tbl.num_rows,
            "quarantined": n_quar,
            "checksum": table_checksum(tbl),
            "wall_sec": round(time.time() - t0, 4),
        }
        payload = json.dumps(manifest).encode()
        mpath = self.manifest_path(pid)
        if self.local:
            mtmp = mpath + ".tmp"
            with open(mtmp, "wb") as f:
                f.write(payload)
            os.replace(mtmp, mpath)
        else:
            with self.fs.open_output_stream(mpath) as f:   # marker PUT, last
                f.write(payload)
        return manifest

    def _owned(self, name: str) -> bool:
        """True for root-level filenames this sink writes — part-*
        shards in EITHER shard format (plus their .tmp), independent of
        which format is currently importable, so a reset() after a
        lance install still clears the stale parquet shards of an
        earlier run.  (Manifest JSONs and quarantine parquets live in
        their own subdirs and are matched there by suffix.)  Reset and
        orphan sweeps touch ONLY owned names, so pointing out_dir at a
        directory containing unrelated files never destroys them."""
        if not name.startswith("part-"):
            return False
        for ext in (".parquet", ".lance"):
            for suffix in ("", ".tmp"):
                if name.endswith(ext + suffix):
                    return True
        return False

    def reset(self) -> int:
        """Delete all SINK-OWNED manifests, outputs, and quarantine
        files — the explicit non-resume mode.  Without this, a
        resume=False re-run into an existing out_dir recomputes every
        partition but ``write_partition`` silently discards the fresh
        tables at the is_done() check, retaining stale data while
        reporting success.  Unrelated files under out_dir are left
        alone.  Returns the number of files removed."""
        from pyarrow.fs import FileType
        n = 0
        qdir = posixpath.join(self.root, "_quarantine")
        for d, keep in ((self.mdir, (".json", ".json.tmp")),
                        (qdir, (".parquet", ".parquet.tmp")),
                        (self.root, None)):
            if self.fs.get_file_info(d).type == FileType.NotFound:
                continue
            for path in self._listdir(d):
                if self.fs.get_file_info(path).type != FileType.File:
                    continue
                name = posixpath.basename(path)
                owned = self._owned(name) if keep is None \
                    else name.endswith(keep)
                if owned:
                    self.fs.delete_file(path)
                    n += 1
        return n

    def orphans(self) -> list[str]:
        """Crash debris: output shards with no manifest, stale ``.tmp``
        files from interrupted local renames, and quarantine parquets
        whose partition never reached its manifest marker."""
        from pyarrow.fs import FileType
        from ..sources import lance_io
        ext = lance_io.shard_ext()
        done_pids = set(self.completed())
        done = {f"part-{pid}{ext}" for pid in done_pids}
        out = []
        for path in self._listdir(self.root):
            name = posixpath.basename(path)
            if not self._owned(name):
                continue                 # never touch unrelated files
            if name.endswith(ext) and name not in done:
                out.append(path)
            elif name.endswith(".tmp"):
                out.append(path)
        qdir = posixpath.join(self.root, "_quarantine")
        if self.fs.get_file_info(qdir).type != FileType.NotFound:
            for path in self._listdir(qdir):
                name = posixpath.basename(path)
                pid = name[:-len(".parquet")] if name.endswith(".parquet") \
                    else None
                if name.endswith(".tmp") or (pid and pid not in done_pids):
                    out.append(path)
        return out

    def clean_orphans(self) -> int:
        orphans = self.orphans()
        for path in orphans:
            self.fs.delete_file(path)
        return len(orphans)
