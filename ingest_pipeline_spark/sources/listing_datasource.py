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


class _ListPartition(InputPartition):
    """A batch of seeds: plain files are emitted directly, directories
    are recursively walked.  Batching top-level files (instead of one
    partition per file) keeps a flat 100k-file root from planning 100k
    single-file tasks, and two-level directory seeding keeps one giant
    subtree from becoming a single straggler partition."""

    def __init__(self, root: str, files: list, dirs: list):
        self.root = root
        self.files = files
        self.dirs = dirs


_FILES_PER_PARTITION = 4096


class FileListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("filelisting source requires option 'path'")
        self.pattern = options.get("pattern")

    def partitions(self):
        import os

        root = os.path.abspath(self.root)
        parts = []

        def split_level(path):
            """Return (files, dirs) directly under path; [] on error."""
            files, dirs = [], []
            try:
                with os.scandir(path) as it:
                    for e in it:
                        try:
                            if e.is_dir(follow_symlinks=False):
                                dirs.append(e.path)
                            else:
                                files.append(e.path)
                        except OSError:
                            continue
            except OSError:
                pass
            return sorted(files), sorted(dirs)

        files, dirs = split_level(root)
        for i in range(0, len(files), _FILES_PER_PARTITION):
            parts.append(_ListPartition(root, files[i : i + _FILES_PER_PARTITION], []))
        # expand one more level so a single huge subtree fans out
        for d in dirs:
            sub_files, sub_dirs = split_level(d)
            for i in range(0, len(sub_files), _FILES_PER_PARTITION):
                parts.append(
                    _ListPartition(root, sub_files[i : i + _FILES_PER_PARTITION], [])
                )
            for sd in sub_dirs:
                parts.append(_ListPartition(root, [], [sd]))
        if not parts:
            # empty/missing root: single no-op partition keeps the scan valid
            parts = [_ListPartition(root, [], [])]
        return parts

    def read(self, partition: _ListPartition):
        import datetime
        import os
        import re

        rx = re.compile(self.pattern) if self.pattern else None

        def emit(fp: str):
            # files can vanish (or be broken symlinks) between planning
            # and read; skip rather than failing the whole task
            try:
                st = os.stat(fp)
            except OSError:
                return None
            return (
                os.path.relpath(fp, partition.root),
                fp,
                st.st_size,
                datetime.datetime.fromtimestamp(
                    st.st_mtime, tz=datetime.timezone.utc
                ),
            )

        for fp in partition.files:
            if rx is None or rx.search(fp):
                row = emit(fp)
                if row is not None:
                    yield row
        for seed in partition.dirs:
            for dirpath, _dirnames, filenames in os.walk(seed):
                for fn in sorted(filenames):
                    fp = os.path.join(dirpath, fn)
                    if rx is None or rx.search(fp):
                        row = emit(fp)
                        if row is not None:
                            yield row


def register(spark) -> None:
    spark.dataSource.register(FileListingDataSource)
