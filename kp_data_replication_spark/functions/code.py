"""Source-code quality statistics — the code-corpus twin of the prose
quality heuristics in functions/text.py.

The corpus this engine replicates is source files keyed (repo, path)
(README.md:68); the filters a code-corpus training pipeline actually
applies are line-shape and character-class statistics (the
StarCoder/The-Stack family: drop files with extreme max line length or
average line length, low alphanumeric fraction, auto-generated or
minified markers). Every statistic here is a pure JVM expression over
ONE line split — no UDF, one projection, bit-identical DuckDB twins
(`code_stats` is hash-exact) — so the filters run at scan speed over
100 TB and the cut thresholds are auditable in SQL.

Line accounting convention (mirrored exactly in the oracle): lines =
split(text, '\\n'); a TRAILING newline therefore contributes one empty
last line, and the empty string has one empty line. Blank = zero chars
after trim; comment = trimmed line starting with #, //, --, * (the
block-comment continuation convention), or /* ; indent = raw line
starting with space or tab. Ratios are over ALL lines (blank included)
except comment_frac, which is over non-blank lines — a densely commented
file should score high comment_frac without blank-padding diluting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMMENT_RE = r"^(#|//|--|\*|/\*)"


def code_stat_columns(ls: Column, raw: Column) -> list[Column]:
    """The statistic columns over a PRE-SPLIT line array ``ls`` and the
    raw text ``raw``. Callers must hoist ``F.split(text, '\\n')`` into its
    own projection first (the HOF-hoisting rule: these expressions
    reference the array ~8 times, and an inlined split would re-split the
    multi-KB text per reference). All ratios rounded to 4dp."""
    n_lines = F.size(ls)
    lens = F.transform(ls, lambda x: F.length(x))
    trimmed = F.transform(ls, lambda x: F.trim(x))
    n_blank = F.size(F.filter(trimmed, lambda x: F.length(x) == 0))
    n_nonblank = n_lines - n_blank
    n_comment = F.size(F.filter(trimmed, lambda x: x.rlike(_COMMENT_RE)))
    n_indent = F.size(F.filter(ls, lambda x: x.rlike(r"^[ \t]")))
    n_chars = F.length(raw)
    n_alnum = F.length(F.regexp_replace(raw, r"[^A-Za-z0-9]", ""))
    autogen = (
        F.lower(raw).contains("auto-generated")
        | F.lower(raw).contains("do not edit")
    )
    return [
        n_lines.cast("long").alias("n_lines"),
        F.coalesce(F.array_max(lens), F.lit(0)).cast("long").alias(
            "max_line_len"
        ),
        F.round(
            F.aggregate(lens, F.lit(0).cast("double"), lambda a, x: a + x)
            / n_lines,
            4,
        ).alias("avg_line_len"),
        F.round(n_blank / n_lines, 4).alias("blank_frac"),
        F.round(
            F.when(n_nonblank > 0, n_comment / n_nonblank).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("comment_frac"),
        F.round(n_indent / n_lines, 4).alias("indent_frac"),
        F.round(
            F.when(n_chars > 0, n_alnum / n_chars).otherwise(F.lit(0.0)), 4
        ).alias("alnum_frac"),
        autogen.alias("is_autogen"),
    ]


def analyze_code(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the code statistics to ``df`` — one projection over one
    hoisted line split."""
    hoisted = df.withColumn("_ls", F.split(F.col(text_col), "\n"))
    return hoisted.select(
        *df.columns, *code_stat_columns(F.col("_ls"), F.col(text_col))
    )


def code_quality_flag(
    max_line_len_cap: int = 1000,
    avg_line_len_cap: float = 100.0,
    min_alnum_frac: float = 0.25,
) -> Column:
    """StarCoder-style keep/drop verdict over the stat columns (apply
    after :func:`analyze_code`): drop minified/one-line blobs (max line),
    machine-generated tables (avg line), binary-ish or symbol-soup
    content (alnum fraction), and declared auto-generated files."""
    return (
        (F.col("max_line_len") <= max_line_len_cap)
        & (F.col("avg_line_len") <= avg_line_len_cap)
        & (F.col("alnum_frac") >= min_alnum_frac)
        & ~F.col("is_autogen")
    ).alias("keep")
