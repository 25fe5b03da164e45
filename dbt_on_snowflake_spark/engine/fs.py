"""Warehouse filesystem operations via the Hadoop FileSystem API.

The engine's staged-rename swap protocol and index-table cleanup were
originally ``os.rename``/``shutil.rmtree`` — correct on the sandbox's
local warehouse but wrong the moment ``spark.sql.warehouse.dir`` points
at an object store (the 100 TB deployment). Routing every mutation
through ``Path.getFileSystem`` makes the SAME code work on file://,
hdfs://, s3a://, gs://, ...: the scheme picks the implementation.

Object-store contract (documented in SCALING.md): rename on S3A is a
copy+delete (O(data), non-atomic across "directories"), so at scale the
swap protocol should be replaced by a metadata commit on a real table
format (Delta/Iceberg). These helpers keep the protocol *portable*; the
table-format migration removes it entirely.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; a missing path is not an error."""
    fs, p = _fs_path(spark, path)
    fs.delete(p, True)


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if not fs.rename(s, d):
        raise OSError(f"rename failed: {src} -> {dst}")


def fs_copy(spark: SparkSession, src: str, dst: str) -> None:
    """Recursive copy (FileUtil.copy) — `clone`'s physical fallback when
    the warehouse has no zero-copy clone primitive. On Delta/Iceberg the
    equivalent is a metadata-only SHALLOW CLONE."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sfs, s = _fs_path(spark, src)
    dfs, d = _fs_path(spark, dst)
    if not jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, s, dfs, d, False, conf):
        raise OSError(f"copy failed: {src} -> {dst}")
