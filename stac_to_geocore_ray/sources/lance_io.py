"""Storage-format dispatch: Lance when importable, parquet otherwise.

BASELINE.json's input is "a Lance table of image + caption pairs"; this
container ships no ``lance`` wheel, so parquet shard directories stand
in (sources/fixtures.py).  This module is the single switch point: an
import probe selects the real Lance path when the library exists, and
every reader in the engine goes through these helpers, so running on a
real Lance deployment needs no code change.

Shard model: a table is a directory of aligned shards — ``*.parquet``
files here, ``*.lance`` datasets (one fragment group each) under
Lance.  ``read_shard``/``shard_names`` abstract over both.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

try:                                          # import probe
    import lance                              # type: ignore
    HAVE_LANCE = True
except ImportError:                           # stand-in env: parquet shards
    lance = None
    HAVE_LANCE = False


def shard_ext() -> str:
    return ".lance" if HAVE_LANCE else ".parquet"


def resolve_fs(path: str):
    """URI or plain path -> (pyarrow.fs.FileSystem, fs-local path).

    ``s3://bucket/key`` resolves to S3FileSystem, ``file:///...`` to
    local, a plain path to the local filesystem unchanged — the S5/S6
    object-store plumbing; the sandbox exercises it through local and
    ``file://`` URIs (no S3 endpoint here, same API).
    """
    from pyarrow import fs as pafs
    if path.startswith("s3://"):
        # construct directly: FileSystem.from_uri does a network
        # HeadBucket to resolve the region, which offline environments
        # (and region-pinned deployments) don't want
        region = os.environ.get("AWS_REGION") \
            or os.environ.get("AWS_DEFAULT_REGION")
        kwargs = {"region": region} if region else {}
        return pafs.S3FileSystem(**kwargs), path[len("s3://"):]
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def shard_names(table_dir: str) -> list[str]:
    """Sorted shard basenames of a table directory (either format),
    enumerated through pyarrow.fs (works for s3:// the same way)."""
    from pyarrow import fs as pafs
    f, local = resolve_fs(table_dir)
    infos = f.get_file_info(pafs.FileSelector(local, recursive=False))
    exts = (".parquet", ".lance") if HAVE_LANCE else (".parquet",)
    return sorted(os.path.basename(i.path) for i in infos
                  if i.path.endswith(exts))


def read_shard(path: str, columns: list[str] | None = None) -> pa.Table:
    """One shard -> Arrow table with column projection pushed down."""
    if path.endswith(".lance"):
        if not HAVE_LANCE:
            raise NotImplementedError(
                "lance is not importable in this environment")
        return lance.dataset(path).to_table(columns=columns)
    f, local = resolve_fs(path)
    return pq.read_table(local, columns=columns, filesystem=f)


def write_shard(tbl: pa.Table, path: str, filesystem=None,
                **parquet_kwargs) -> None:
    # atomic-rename writers pass "<final>.tmp"; dispatch on the final name
    fmt_key = path[:-4] if path.endswith(".tmp") else path
    if fmt_key.endswith(".lance"):
        if not HAVE_LANCE:
            raise NotImplementedError(
                "lance is not importable in this environment")
        if filesystem is not None:
            # an fs-local path is MEANINGLESS to lance.write_dataset
            # (it would silently write to worker-local disk while the
            # manifest marker lands on the object store); Lance takes
            # full URIs — callers must pass the original URI instead
            raise NotImplementedError(
                "write_shard(.lance) does not accept a pyarrow "
                "filesystem; pass the full URI to the Lance path")
        lance.write_dataset(tbl, path, mode="overwrite")
        return
    pq.write_table(tbl, path, filesystem=filesystem, **parquet_kwargs)


def read_ray_dataset(table_path: str, *, columns=None, **kwargs):
    """Streaming Ray Dataset over a table path (file, shard dir, or
    Lance dataset), format-dispatched."""
    import ray.data as rd

    from ..stages.util import clean_read_parquet
    if HAVE_LANCE and table_path.endswith(".lance"):
        return rd.read_lance(table_path, columns=columns, **kwargs)
    return clean_read_parquet(table_path, columns=columns, **kwargs)
