"""Host-level boilerplate line detection and removal — the
trafilatura/CCNet preprocessing step the reference engine has no
analogue for (SURVEY.md §2.11): nav bars, cookie banners, and footers
repeat on nearly every page of a host, and feeding them to an LLM
corpus both wastes tokens and poisons dedup (every page of a host
looks 30% identical to every other).

Semantics: a line (newline-split, trimmed, non-empty) is boilerplate
for a host when it appears in at least ``min_pct`` percent of the
host's docs AND the host has at least ``min_docs`` docs (singleton
hosts have no repetition signal). The decision is ALL-INTEGER
(``100 * n_docs >= min_pct * host_docs``) — no FP threshold, so the
classification is bit-stable and exactly SQL-expressible.

100 TB shape: explode-to-lines is a Catalyst projection; the only
shuffles are a (host, line) groupBy with map-side partial aggregation
and a host-sized groupBy, both keyed on columns the downstream strip
join reuses. Per-host line cardinality is bounded by page size, not
corpus size; no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lines(
    docs: DataFrame, id_col: str = "doc_id", host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Explode docs to distinct (host, doc, line) rows: newline-split,
    trimmed, '' dropped. DISTINCT per doc — a line repeated within one
    doc counts once toward its host frequency."""
    return (
        docs.select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("host", "doc", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
        .distinct()
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    min_pct: int = 80,
    min_docs: int = 3,
) -> DataFrame:
    """Detect per-host boilerplate: ``(host, line, n_docs, host_docs)``
    for every line appearing in >= ``min_pct``% of a host's docs (hosts
    with >= ``min_docs`` docs only). Integer threshold arithmetic."""
    lines = doc_lines(docs, id_col=id_col, host_col=host_col,
                      text_col=text_col)
    # doc_lines is already distinct on (host, doc, line), so a plain
    # count IS the distinct-doc count — no second dedup pass
    per_line = lines.groupBy("host", "line").agg(
        F.count("*").alias("n_docs")
    )
    per_host = (
        docs.select(F.col(host_col).alias("host"), F.col(id_col).alias("doc"))
        .groupBy("host")
        .agg(F.countDistinct("doc").alias("host_docs"))
    )
    return (
        per_line.join(per_host, "host")
        .filter(
            (F.col("host_docs") >= F.lit(int(min_docs)))
            & (F.col("n_docs") * 100 >= F.lit(int(min_pct)) * F.col("host_docs"))
        )
        .select(
            F.col("host").alias(host_col), "line", "n_docs", "host_docs"
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    bp: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Remove detected boilerplate lines from each doc — and ONLY
    those: a line goes iff its trimmed form is in the host's detected
    set; every surviving line keeps its original whitespace, and blank
    lines (paragraph boundaries — load-bearing for the downstream
    LM/dedup operators) survive verbatim. All-boilerplate docs keep an
    empty string. Broadcast the per-host boilerplate — it's bounded by
    hosts x page-size, tiny relative to the corpus."""
    bp_sets = bp.groupBy(F.col(host_col).alias("_h")).agg(
        F.collect_set("line").alias("_bp")
    )
    j = docs.join(
        F.broadcast(bp_sets), docs[host_col] == F.col("_h"), "left"
    )
    bp_arr = F.coalesce(F.col("_bp"), F.array().cast("array<string>"))
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda s: ~F.coalesce(
            F.array_contains(bp_arr, F.trim(s)), F.lit(False)
        ),
    )
    return j.select(
        *[c for c in docs.columns if c != text_col],
        F.array_join(kept, "\n").alias(text_col),
    )


def boilerplate_oracle_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    min_pct: int = 80,
    min_docs: int = 3,
) -> str:
    """DuckDB oracle for :func:`boilerplate_lines` over ``docs_sql``."""
    return f"""
    WITH d AS MATERIALIZED ({docs_sql}),
    lines0 AS (
      SELECT {host_col} AS host, {id_col} AS doc,
             trim(unnest(string_split({text_col}, chr(10)))) AS line
      FROM d),
    nz AS (SELECT DISTINCT host, doc, line FROM lines0 WHERE line != ''),
    per_line AS (
      SELECT host, line, count(*)::BIGINT AS n_docs
      FROM nz GROUP BY host, line),
    per_host AS (
      SELECT {host_col} AS host, count(DISTINCT {id_col})::BIGINT AS host_docs
      FROM d GROUP BY 1)
    SELECT l.host AS {host_col}, l.line, l.n_docs, h.host_docs
    FROM per_line l JOIN per_host h USING (host)
    WHERE h.host_docs >= {int(min_docs)}
      AND l.n_docs * 100 >= {int(min_pct)} * h.host_docs
    """
