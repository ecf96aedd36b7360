"""Folder-listing DataSource: the reference's S3 as a literal source.

The reference lists a Drive folder with a query filter and a field
projection (etl_service/main.py:106-116: ``files().list(q="'<folder>' in
parents", fields="files(id, name, mimeType)")``). Here the same operator
is a Spark Python DataSource over a directory: name/extension predicates
push INTO the listing (entries are skipped before a row is ever built,
the analog of the Drive-side ``q``), and column pruning covers the
``fields`` projection.

Scale posture: a directory listing is metadata-scale (one entry per file,
no payload reads -- ``os.scandir`` stat results), so the source plans ONE
partition; the downstream per-file WORK (reading the listed files) is
what fans out, and that is the ordinary file-source path. A million-file
bucket listing would partition by prefix; the option hook is there
(``prefix``) without pretending the local fixture needs it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    IsNotNull,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

LISTING_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("ext", StringType()),
        StructField("size", LongType()),
        StructField("path", StringType()),
    ]
)


@dataclass
class _ListPartition(InputPartition):
    idx: int


def _ext(name: str) -> str:
    _, dot, ext = name.rpartition(".")
    return ext if dot else ""


class FolderListingReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.prefix = options.get("prefix", "")
        # pushed-name predicates, applied while scanning the directory
        self._name_pred = []  # list of python callables name -> bool
        self._ext_allow: set[str] | None = None
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        unsupported: list[Filter] = []
        for f in filters:
            if isinstance(f, StringEndsWith) and f.attribute == ("name",):
                self._name_pred.append(
                    lambda n, suf=f.value: n.endswith(suf)
                )
                self.pushed.append(f)
            elif isinstance(f, StringStartsWith) and f.attribute == ("name",):
                self._name_pred.append(
                    lambda n, pre=f.value: n.startswith(pre)
                )
                self.pushed.append(f)
            elif isinstance(f, StringContains) and f.attribute == ("name",):
                self._name_pred.append(lambda n, sub=f.value: sub in n)
                self.pushed.append(f)
            elif isinstance(f, EqualTo) and f.attribute == ("ext",):
                self._ext_allow = {f.value}
                self.pushed.append(f)
            elif isinstance(f, In) and f.attribute == ("ext",):
                self._ext_allow = set(f.value)
                self.pushed.append(f)
            elif isinstance(f, IsNotNull) and f.attribute in (
                ("name",),
                ("ext",),
                ("path",),
            ):
                self.pushed.append(f)  # listing never yields NULL names
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self) -> list[_ListPartition]:
        return [_ListPartition(0)]

    def read(self, partition: _ListPartition) -> Iterator[tuple]:
        for entry in sorted(os.scandir(self.path), key=lambda e: e.name):
            if not entry.is_file() and not entry.is_dir():
                continue
            name = entry.name
            if self.prefix and not name.startswith(self.prefix):
                continue
            if any(not pred(name) for pred in self._name_pred):
                continue
            ext = _ext(name)
            if self._ext_allow is not None and ext not in self._ext_allow:
                continue
            size = entry.stat().st_size if entry.is_file() else 0
            yield (name, ext, size, os.path.join(self.path, name))


class FolderListingDataSource(DataSource):
    """``spark.read.format("folder_listing").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "folder_listing"

    def schema(self) -> StructType:
        return LISTING_SCHEMA

    def reader(self, schema: StructType) -> FolderListingReader:
        return FolderListingReader(self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FolderListingDataSource)
