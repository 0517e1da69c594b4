"""Custom file-listing data source (Spark 4 Python Data Source API).

The optional custom piece from SURVEY §4: a "hubmapfs"-style scan
whose PLANNING step assigns one input partition per top-level
directory, so the expensive recursive walk (the bottleneck at 100 TB
file counts) runs fully distributed — executors walk subtrees in
parallel, nothing is listed on the driver beyond the partition seeds.

Usage:
    spark.dataSource.register(FileListingDataSource)
    files = (spark.read.format("filelisting")
             .option("path", "/data/uploads")
             .option("pattern", r"\\.tiff$")      # optional pre-filter
             .load())

Compared to sources.readers.listing (driver-seeded RDD walk), this is
a first-class source: it appears in scans/plans like any table,
supports options, and its partition planning is the engine's own.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class FileListingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "filelisting"

    def schema(self) -> str:
        return "rel_path string, abs_path string, size long, mtime timestamp"

    def reader(self, schema) -> "FileListingReader":
        return FileListingReader(self.options)


class _DirPartition(InputPartition):
    def __init__(self, root: str, seed: str):
        self.root = root
        self.seed = seed


class FileListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("filelisting source requires option 'path'")
        self.pattern = options.get("pattern")

    def partitions(self):
        import os

        root = os.path.abspath(self.root)
        try:
            seeds = sorted(
                os.path.join(root, d) for d in os.listdir(root)
            )
        except FileNotFoundError:
            seeds = []
        if not seeds:
            # empty/missing root: single no-op partition keeps the scan valid
            return [_DirPartition(root, "")]
        return [_DirPartition(root, s) for s in seeds]

    def read(self, partition: _DirPartition):
        import datetime
        import os
        import re

        if not partition.seed:
            return
        rx = re.compile(self.pattern) if self.pattern else None

        def emit(fp: str):
            st = os.stat(fp)
            return (
                os.path.relpath(fp, partition.root),
                fp,
                st.st_size,
                datetime.datetime.fromtimestamp(
                    st.st_mtime, tz=datetime.timezone.utc
                ),
            )

        seed = partition.seed
        if os.path.isfile(seed):
            if rx is None or rx.search(seed):
                yield emit(seed)
            return
        for dirpath, _dirnames, filenames in os.walk(seed):
            for fn in sorted(filenames):
                fp = os.path.join(dirpath, fn)
                if rx is None or rx.search(fp):
                    yield emit(fp)


def register(spark) -> None:
    spark.dataSource.register(FileListingDataSource)
