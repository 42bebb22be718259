"""Export utilities (the reference's Export-to-csv.py side tool, S10).

parquet -> CSV via the streaming Dataset API: reference behavior was
S3-parquet -> whole-file pandas -> local CSV (Export-to-csv.py:26-43);
here it is read_parquet -> write_csv, streaming block-by-block, plus a
GeoCore-JSON sink matching the reference's one-object-per-record
output (S7) at block granularity.
"""

from __future__ import annotations


def parquet_to_csv(src: str, dst_dir: str, columns: list[str] | None = None):
    """Streaming parquet -> directory of CSV part files."""
    from ..stages.util import clean_read_parquet
    ds = clean_read_parquet(src, columns=columns)
    ds.write_csv(dst_dir)
    return dst_dir


def write_geocore_json(flat_ds, dst_dir: str, cfg=None):
    """Translated flat rows -> directory of JSON part files, each line a
    full GeoCore FeatureCollection (the reference's per-record .geojson
    objects, batched into files instead of one PUT per record)."""
    from ..config import DEFAULT_CONFIG
    from ..stages.assemble import RecordAssembler
    ds = flat_ds.map_batches(RecordAssembler, fn_constructor_args=(cfg or DEFAULT_CONFIG,),
                             batch_format="pyarrow", concurrency=(1, 2))
    ds.write_json(dst_dir)
    return dst_dir
