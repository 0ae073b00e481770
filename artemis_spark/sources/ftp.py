"""FTP directory-listing parser + child-task emission (S5/T4 slice).

Reference: ``FTPDefaultHandler`` fetches with ftplib and parses unix
``ls -l`` lines into (name, lastModified, is_dir)
(/root/reference/src/handlers/FTPDefaultHandler.py:9-35), then turns a
directory listing into child Tasks via ``urljoin(task.url + "/", name)``
(:56-66).  The listing grammar is pure string logic, so it is fully
implementable in-sandbox as native column expressions; only the live
FTP socket is stubbed (no network egress).

Grammar reproduced exactly (parseLine):
  * fields = whitespace-split, empties dropped;
  * permission = first field; ``l`` prefix (symlink) -> the name is the
    3rd-from-last field (left of ``-> target``), else the last field;
  * ``d`` prefix -> directory, mtime = -1;
  * file mtime from the 3 fields before the name, tried as
    ``%b %d %H:%M`` (year assumed — the reference uses "today's year",
    which is nondeterministic; here it is an explicit parameter) then
    ``%b %d  %Y``, else -1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import resolve_url

FTP_ENTRY_TYPE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("mtime_epoch", T.LongType()),  # -1 = unknown / dir
        T.StructField("is_dir", T.BooleanType()),
    ]
)


def parse_ls_line(line: Column, assume_year: int = 2026) -> Column:
    """struct(name, mtime_epoch, is_dir) from one unix ``ls -l`` line.

    ``assume_year`` replaces the reference's ``datetime.date.today().year``
    (FTPDefaultHandler.py:25) so results are deterministic.
    """
    toks = F.filter(F.split(F.trim(line), " "), lambda x: x != "")
    perm = F.element_at(toks, 1)
    is_link = perm.startswith("l")
    is_dir = perm.startswith("d")
    name = F.when(is_link, F.element_at(toks, -3)).otherwise(F.element_at(toks, -1))
    # the 3 date fields sit immediately before the name
    d = [
        F.when(is_link, F.element_at(toks, p - 2)).otherwise(F.element_at(toks, p))
        for p in (-4, -3, -2)
    ]
    with_year = F.try_to_timestamp(
        F.concat_ws(" ", F.lit(str(assume_year)), d[0], d[1], d[2]),
        F.lit("yyyy MMM d H:mm"),
    )
    explicit_year = F.try_to_timestamp(
        F.concat_ws(" ", d[0], d[1], d[2]), F.lit("MMM d yyyy")
    )
    mtime = F.when(
        is_dir, F.lit(-1).cast("long")
    ).otherwise(
        F.coalesce(
            F.unix_timestamp(with_year),
            F.unix_timestamp(explicit_year),
            F.lit(-1).cast("long"),
        )
    )
    return F.when(
        F.size(toks) >= 4,
        F.struct(name.alias("name"), mtime.alias("mtime_epoch"), is_dir.alias("is_dir")),
    )


def dir_children(
    listings: DataFrame,
    url_col: str = "url",
    lines_col: str = "listing",
    assume_year: int = 2026,
) -> DataFrame:
    """Directory recursion (T4 analogue, FTPDefaultHandler.py:56-66 +
    ExtractorFactory.py:93-108): explode a directory's ``ls`` lines into
    child rows (parent, url, name, mtime_epoch, is_dir).

    Child URL = resolve(name against parent + "/"), the urljoin the
    reference performs; recursion = feeding ``is_dir`` children back in.
    """
    exploded = listings.select(
        F.col(url_col).alias("parent"),
        F.explode(F.col(lines_col)).alias("_line"),
    ).withColumn("_e", parse_ls_line(F.col("_line"), assume_year))
    return (
        exploded.filter(F.col("_e").isNotNull())
        .select(
            "parent",
            resolve_url(
                F.concat(F.col("parent"), F.lit("/")), F.col("_e.name")
            ).alias("url"),
            F.col("_e.name").alias("name"),
            F.col("_e.mtime_epoch").alias("mtime_epoch"),
            F.col("_e.is_dir").alias("is_dir"),
        )
    )


def recurse_listing_tree(
    listings: DataFrame,
    max_depth: int = 8,
    url_col: str = "url",
    lines_col: str = "listing",
    assume_year: int = 2026,
) -> DataFrame:
    """T4 directory recursion (ExtractorFactory.py:93-108 over FTP dirs,
    FTPDefaultHandler.py:56-66): expand a table of (url, listing) rows
    into ALL reachable files/dirs, following is_dir children that have
    their own listing row.

    Batch-iterative like the crawl loop: each iteration is one DataFrame
    level (explode + self-join on the child URL), not per-row Python
    recursion — the shape that survives a directory tree with millions
    of entries.  Returns (parent, url, name, mtime_epoch, is_dir, depth).
    """
    all_children = dir_children(listings, url_col, lines_col, assume_year)
    # roots = listed dirs that are nobody's child (depth-0 entry points)
    root_urls = listings.select(F.col(url_col).alias("parent")).join(
        all_children.select(F.col("url").alias("parent")), "parent", "left_anti"
    )
    lvl = all_children.join(root_urls, "parent", "left_semi").withColumn(
        "depth", F.lit(1)
    )
    out = lvl
    by_url = listings.select(
        F.col(url_col).alias("_lurl"), F.col(lines_col).alias("_llines")
    )
    for d in range(2, max_depth + 1):
        sub = (
            lvl.filter("is_dir")
            .join(by_url, F.col("url") == F.col("_lurl"), "inner")
            .select(F.col("url").alias("u"), F.col("_llines").alias("listing"))
        )
        lvl = dir_children(sub, "u", "listing", assume_year).withColumn(
            "depth", F.lit(d)
        )
        if lvl.isEmpty():
            break
        out = out.unionByName(lvl)
    return out


def ftp_fetch_stub(wave: DataFrame) -> DataFrame:
    """Signature-pinning stub for a live FTP fetcher (no network egress
    in-sandbox).  On a cluster this becomes a ``mapInPandas`` batch that
    runs LIST/RETR per row (FTPDefaultHandler.py:68-118), yielding the
    same columns as the HTTP fetch plus ``listing: array<string>`` for
    directories; ``dir_children`` then consumes the listing column."""
    raise NotImplementedError("no network egress in this environment")
