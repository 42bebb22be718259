"""Custom Ray ``Datasource`` for the co-partitioned images table.

The idiomatic form of the pages->read-tasks mapping (SURVEY.md §2.1
S3): ``get_read_tasks`` enumerates input fragments (here: the aligned
images + stac_items shard pairs; on a live STAC API: the /search page
chain from sources/paged_api.walk_pages) and each ``ReadTask`` carries
its own metadata estimate so the streaming executor can plan memory
before reading a byte.  Reading through this datasource yields the
pre-joined (image x footprint) blocks directly — the zero-shuffle
AlignedCoRead expressed as a first-class source:

    ds = ray.data.read_datasource(AlignedImagesDatasource(sf_dir))
"""

from __future__ import annotations

import glob
import os

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


class AlignedImagesDatasource(Datasource):
    """images + stac_items shard pairs -> one ReadTask per shard."""

    def __init__(self, images_dir: str, items_dir: str,
                 item_cols: tuple[str, ...] = ()):
        from . import lance_io
        self.images_dir = images_dir
        self.items_dir = items_dir
        self.item_cols = tuple(item_cols)
        self._shards = lance_io.shard_names(items_dir)

    def estimate_inmemory_data_size(self) -> int | None:
        return sum(os.path.getsize(os.path.join(self.images_dir, s))
                   for s in self._shards)

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        images_dir, items_dir = self.images_dir, self.items_dir
        item_cols = self.item_cols
        tasks = []
        for name in self._shards:
            img_path = os.path.join(images_dir, name)
            items_path = os.path.join(items_dir, name)
            size = os.path.getsize(img_path)

            def make_read(img_path=img_path, items_path=items_path):
                def _read():
                    import pyarrow as pa

                    from . import lance_io
                    img = lance_io.read_shard(img_path,
                                              columns=["image_id", "bytes"])
                    items = lance_io.read_shard(
                        items_path, columns=["image_id", "bbox", *item_cols])
                    assert (img["image_id"].to_pylist()
                            == items["image_id"].to_pylist()), \
                        "shards not co-partitioned"
                    merged = img
                    bb = items["bbox"]
                    if isinstance(bb, pa.ChunkedArray):
                        bb = bb.combine_chunks()
                    m = bb.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)
                    for i, cname in enumerate(("bw", "bs", "be", "bn")):
                        merged = merged.append_column(cname, pa.array(m[:, i]))
                    for c in item_cols:
                        merged = merged.append_column(c, items[c])
                    return [merged]
                return _read

            meta = BlockMetadata(num_rows=None, size_bytes=size,
                                 input_files=[img_path, items_path],
                                 exec_stats=None)
            tasks.append(ReadTask(make_read(), meta))
        return tasks
