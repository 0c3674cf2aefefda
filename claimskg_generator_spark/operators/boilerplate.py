"""Boilerplate-line removal by within-group line document-frequency.

The CCNet / RefinedWeb line-wise filter: a line that appears in more
than ``max_doc_frac`` of a source's documents is chrome (navigation,
cookie banners, copyright footers), not content, and is dropped from
every document — the remaining lines are stitched back in original
order.  Grouping by source/host matters: "subscribe to our
newsletter" is boilerplate on the site that stamps it everywhere and
legitimate content in a corpus-wide sense.

Scale shape: explode is linear in total line count; the line document
frequency is ONE map-side-combinable groupBy over (group, line-hash)
after an in-row distinct (a line repeated inside one document counts
once — dedup happens in the array domain, before the explode, so the
shuffle never carries the duplicate); group totals are a one-row-per-
group broadcast; the boilerplate set joins back as a left-anti on
(group, line) and documents reassemble with ONE groupBy(id) using an
in-row sort (array_sort over (pos, line) structs — no per-group
window sort).  Two shuffles end-to-end, both keyed small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    max_doc_frac: float = 0.5,
    sep: str = "\n",
) -> DataFrame:
    """Remove lines whose within-``group_col`` document frequency
    exceeds ``max_doc_frac`` (strict >, so 0.5 keeps a line present in
    exactly half the docs).  Empty lines are structural, not content,
    and are always kept in place.

    Output: ``id_col``, ``group_col``, ``clean_text`` (kept lines
    joined by ``sep``; '' when everything was boilerplate),
    ``n_kept``, ``n_dropped``.  Every input row survives — a fully-
    boilerplate document shows up with clean_text = '' rather than
    silently vanishing.
    """
    if not (0.0 < max_doc_frac <= 1.0):
        raise ValueError(
            f"max_doc_frac must be in (0, 1], got {max_doc_frac}")
    base = df.select(
        id_col, group_col,
        F.split(F.coalesce(F.col(text_col), F.lit("")), sep, -1)
        .alias("_lines"),
    )
    lines = base.select(
        id_col, group_col,
        F.posexplode("_lines").alias("_pos", "_line"),
    )
    # doc frequency: each distinct non-empty line counts once per doc —
    # dedup in the array domain so the groupBy never sees repeats
    docfreq = (
        base.select(
            group_col,
            F.explode(
                F.array_distinct(F.filter("_lines", lambda x: x != ""))
            ).alias("_line"),
        )
        .groupBy(group_col, "_line")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    totals = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_docs"))
    boiler = (
        docfreq.join(F.broadcast(totals), group_col)
        .filter(F.col("_df") > F.lit(float(max_doc_frac)) * F.col("_docs"))
        .select(group_col, "_line")
    )
    kept_flag = lines.join(
        boiler.withColumn("_boiler", F.lit(True)),
        [group_col, "_line"], "left",
    ).select(
        id_col, group_col, "_pos", "_line",
        F.coalesce("_boiler", F.lit(False)).alias("_is_boiler"),
    )
    return (
        kept_flag.groupBy(id_col, group_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("_is_boiler"),
                           F.struct("_pos", "_line"))
                )
            ).alias("_kept"),
            F.sum(F.col("_is_boiler").cast("long")).alias("n_dropped"),
        )
        .select(
            id_col, group_col,
            F.array_join(F.transform("_kept", lambda s: s["_line"]),
                         sep).alias("clean_text"),
            F.size("_kept").cast("long").alias("n_kept"),
            "n_dropped",
        )
    )
