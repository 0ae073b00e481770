"""FTP unix-ls listing parser (S5 slice) golden tests, mirroring the
reference parseLine semantics (/root/reference/src/handlers/FTPDefaultHandler.py:9-35)
and directory child emission (:56-66)."""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artemis_spark.sources.ftp import (  # noqa: E402
    dir_children,
    parse_ls_line,
    recurse_listing_tree,
)


def _utc_epoch(*args) -> int:
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp())


CASES = [
    # (line, expected name, expected mtime epoch, expected is_dir)
    (
        "drwxr-xr-x  2 ftp ftp      4096 Jun 06 10:19 pub",
        "pub", -1, True,
    ),
    (
        "-rw-r--r--  1 ftp ftp   1048576 Jun 06 10:19 data.bin",
        "data.bin", _utc_epoch(2026, 6, 6, 10, 19), False,
    ),
    (
        "-rw-r--r--  1 ftp ftp      1234 Jan 16  2012 old.tar.gz",
        "old.tar.gz", _utc_epoch(2012, 1, 16), False,
    ),
    (
        "lrwxrwxrwx  1 ftp ftp        11 Jun 06 10:19 latest -> data.bin",
        "latest", _utc_epoch(2026, 6, 6, 10, 19), False,
    ),
    (  # single-digit day, extra spaces
        "-rw-r--r--  1 ftp  ftp    77 Jun  6 09:05 x.txt",
        "x.txt", _utc_epoch(2026, 6, 6, 9, 5), False,
    ),
    (  # unparseable date -> -1 (reference's double-except path)
        "-rw-r--r--  1 ftp ftp 77 ??? 99 9999 weird.bin",
        "weird.bin", -1, False,
    ),
]


def test_parse_ls_line_golden(spark):
    df = spark.createDataFrame([(l,) for l, *_ in CASES], "line: string")
    got = df.select(parse_ls_line(F.col("line"), assume_year=2026).alias("e")).collect()
    for (line, name, mtime, is_dir), row in zip(CASES, got):
        e = row["e"]
        assert e["name"] == name, line
        assert e["mtime_epoch"] == mtime, line
        assert e["is_dir"] == is_dir, line


def test_parse_garbage_line_is_null(spark):
    df = spark.createDataFrame([("total 12",), ("",)], "line: string")
    got = df.select(parse_ls_line(F.col("line")).alias("e")).collect()
    assert all(r["e"] is None for r in got)


def test_recurse_listing_tree(spark):
    """T4 directory recursion (ExtractorFactory.py:93-108): a 3-level
    tree expands fully; files at every depth, dirs followed exactly once."""
    listings = spark.createDataFrame(
        [
            ("ftp://f.test/root", [
                "drwxr-xr-x 2 f f 4096 Jun 06 10:19 a",
                "-rw-r--r-- 1 f f   10 Jun 06 10:19 top.txt",
            ]),
            ("ftp://f.test/root/a", [
                "drwxr-xr-x 2 f f 4096 Jun 06 10:19 b",
                "-rw-r--r-- 1 f f   20 Jun 06 10:19 mid.txt",
            ]),
            ("ftp://f.test/root/a/b", [
                "-rw-r--r-- 1 f f   30 Jun 06 10:19 deep.txt",
            ]),
        ],
        "url: string, listing: array<string>",
    )
    rows = recurse_listing_tree(listings).collect()
    got = {(r["url"], r["depth"], r["is_dir"]) for r in rows}
    assert got == {
        ("ftp://f.test/root/a", 1, True),
        ("ftp://f.test/root/top.txt", 1, False),
        ("ftp://f.test/root/a/b", 2, True),
        ("ftp://f.test/root/a/mid.txt", 2, False),
        ("ftp://f.test/root/a/b/deep.txt", 3, False),
    }


def test_dir_children_urljoin(spark):
    listings = spark.createDataFrame(
        [
            (
                "ftp://files.test/pub",
                [
                    "drwxr-xr-x 2 ftp ftp 4096 Jun 06 10:19 sub",
                    "-rw-r--r-- 1 ftp ftp   77 Jun 06 10:19 a.bin",
                ],
            )
        ],
        "url: string, listing: array<string>",
    )
    rows = {r["name"]: r for r in dir_children(listings).collect()}
    # urljoin(task.url + "/", name) — FTPDefaultHandler.py:64
    assert rows["sub"]["url"] == "ftp://files.test/pub/sub"
    assert rows["sub"]["is_dir"] is True
    assert rows["a.bin"]["url"] == "ftp://files.test/pub/a.bin"
    assert rows["a.bin"]["is_dir"] is False
