"""Source-code quality statistics (functions/code.py): hand-computed
values on edge cases, keep-flag semantics, and the pure-JVM plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from kp_data_replication_spark.functions.code import (
    analyze_code,
    code_quality_flag,
)


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return analyze_code(df).collect()[0].asDict()


def test_line_accounting_and_ratios(spark):
    # 5 lines: code, comment, blank, indented code, trailing newline ->
    # empty last line
    text = "x = 1\n# set it\n\n    y = 2\n"
    s = _stats(spark, text)
    assert s["n_lines"] == 5
    assert s["max_line_len"] == len("    y = 2")
    # lens: 5, 8, 0, 9, 0 -> avg 22/5
    assert s["avg_line_len"] == round(22 / 5, 4)
    assert s["blank_frac"] == round(2 / 5, 4)  # "" and trailing ""
    assert s["comment_frac"] == round(1 / 3, 4)  # over 3 non-blank lines
    assert s["indent_frac"] == round(1 / 5, 4)
    assert s["is_autogen"] is False


def test_comment_conventions(spark):
    text = "// c\n-- sql\n* block cont\n/* open\nplain"
    s = _stats(spark, text)
    assert s["comment_frac"] == round(4 / 5, 4)


def test_autogen_and_keep_flag(spark):
    rows = [
        (1, "ok = 1\nfine()"),
        (2, "DO NOT EDIT\nmachine made"),
        (3, "x" * 2000),  # one 2000-char minified line
        (4, "@@@ !!! ### $$$ %%%"),  # symbol soup, alnum_frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["keep"]
        for r in analyze_code(df).select("doc_id", code_quality_flag()).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: False}


def test_empty_and_single_line(spark):
    s = _stats(spark, "")
    assert s["n_lines"] == 1 and s["blank_frac"] == 1.0
    assert s["alnum_frac"] == 0.0 and s["comment_frac"] == 0.0
    s2 = _stats(spark, "just one line of code")
    assert s2["n_lines"] == 1 and s2["indent_frac"] == 0.0


def test_plan_is_single_projection_no_python(spark):
    from kp_data_replication_spark.plans.audit import (
        assert_no_row_python,
        plan_string,
    )

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("a = 1\n# c\n  b = 2").alias("text"),
    )
    out = analyze_code(df)
    plan = plan_string(out, mode="simple")
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert_no_row_python(out)


def test_curate_code_filter_stage(spark, tmp_path):
    """The optional code-quality gate runs FIRST in the funnel: planted
    minified / auto-generated / symbol-soup files drop before any dedup
    join; ordinary files flow through to packs unchanged."""
    from pyspark.sql import functions as F

    from kp_data_replication_spark.curate import curate_to_dir

    rows = [
        (i, "\n".join(f"line_{i}_{j} = {j}" for j in range(20)), "en")
        for i in range(10)
    ]
    rows.append((100, "x" * 3000, "en"))                # minified blob
    rows.append((101, "DO NOT EDIT\ngenerated()", "en"))  # declared autogen
    rows.append((102, "@@ !! ## $$ %% ^^ && **", "en"))   # symbol soup
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p_in = str(tmp_path / "docs_in")
    docs.withColumn("source", F.lit("s0")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(p_in)

    out = str(tmp_path / "curated_out")
    stats = curate_to_dir(
        spark, p_in, out, pack_budget=256, pack_shards=2, code_filter=True
    )
    assert stats["n_input"] == 13
    assert stats["n_after_code_filter"] == 10 and stats["code_filtered"] == 3
    assert stats["exact_dupes_removed"] == 0  # accounting is post-gate
    curated = {r["doc_id"] for r in
               spark.read.parquet(out + "/curated").collect()}
    assert curated == set(range(10))
