"""Document-quality gates from the published webtext pipelines: the
Gopher rules (Rae et al. 2021, "Scaling Language Models: ... Gopher",
Appendix A1.1) and C4's line-level cleaning (Raffel et al. 2020, JMLR
§2.2). These are THE standard pre-training filters — every major corpus
(MassiveText, C4, RefinedWeb, FineWeb) is some remix of them — and the
natural next stage after this repo's dedup/boilerplate suite.

Both operators are pure Catalyst column expressions (split / filter /
aggregate lambdas — JVM codegen, no Python in the hot path) and carry
ALL-INTEGER decision arithmetic (ratios compared as ``100*a >= k*b``),
so every flag is bit-stable at any parallelism and exactly
SQL-expressible for the DuckDB oracles.

The reference engine's only quality gate is the listing-completeness
branch (apiserver/index.js:214); these are the web-scale generalization
a 100 TB crawl feeds to its training-data sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's stop-word probe: the doc must contain >= 2 of these (rule 8).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Gopher rule constants (Rae et al. 2021 A1.1), integer-encoded:
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN_X10 = 30  # mean word length in [3, 10]
GOPHER_MAX_MEAN_LEN_X10 = 100
GOPHER_MAX_SYMBOL_PCT = 10  # '#' or '...' to words <= 0.1
GOPHER_MAX_BULLET_PCT = 90  # <= 90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_PCT = 30  # <= 30% of lines end with '...'
GOPHER_MIN_ALPHA_PCT = 80  # >= 80% of words contain a letter
GOPHER_MIN_STOPWORDS = 2


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def _lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def gopher_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher quality rules -> integer stats + one boolean
    per rule + the conjunction ``pass_gopher``.

    Rules (Rae et al. 2021 Appendix A1.1), integer semantics mirrored
    exactly by :func:`gopher_oracle_sql`:

    1. word count in [50, 100000] (words = non-empty whitespace splits);
    2. mean word length in [3, 10] — compared as
       ``10*total_chars`` vs ``30*n_words`` / ``100*n_words``;
    3. symbol-to-word ratio <= 0.1, symbols = '#' occurrences plus
       '...' occurrences (non-overlapping count);
    4. <= 90% of non-empty lines start with a bullet ('-', '*', or the
       Unicode bullet);
    5. <= 30% of non-empty lines end with an ellipsis ('...' or the
       Unicode ellipsis);
    6. >= 80% of words contain at least one ASCII letter;
    7. >= 2 distinct stop words from the 8-word probe list (matched on
       lowercased words).

    Documents with zero words fail 1/2/6/7 and their ratio stats read 0.
    100 TB shape: one projection, no shuffle at all — every rule is an
    aggregate lambda over the split arrays inside whole-stage codegen.
    """
    # words/lines arrays materialized ONCE in a first projection — the
    # old inlined form re-ran the split as the target of every
    # higher-order function (5 word splits + 2 line splits per row; the
    # b380772 lesson applied at the 1x-per-HOF level). Same values.
    words = F.col("_w")
    lines = F.col("_ln")
    n_words = F.size(words)
    n_lines = F.size(lines)
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.size(F.split(F.col(text_col), "#", -1)) - 1
    n_ellipsis_sym = F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    n_bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ")
            | ln.startswith("* ")
            | ln.startswith("•"),
        )
    )
    n_ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda ln: ln.endswith("...") | ln.endswith("…"),
        )
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array([F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    d = docs.select(
        F.col(id_col),
        F.col(text_col),
        _words(F.col(text_col)).alias("_w"),
        _lines(F.col(text_col)).alias("_ln"),
    ).select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_lines.cast("long").alias("n_lines"),
        total_chars.cast("long").alias("n_word_chars"),
        (n_hash + n_ellipsis_sym).cast("long").alias("n_symbols"),
        n_bullet_lines.cast("long").alias("n_bullet_lines"),
        n_ellipsis_lines.cast("long").alias("n_ellipsis_lines"),
        n_alpha_words.cast("long").alias("n_alpha_words"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    nw = F.col("n_words")
    nl = F.greatest(F.col("n_lines"), F.lit(1))
    r1 = (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS)
    r2 = (
        (nw > 0)
        & (F.col("n_word_chars") * 10 >= GOPHER_MIN_MEAN_LEN_X10 * nw)
        & (F.col("n_word_chars") * 10 <= GOPHER_MAX_MEAN_LEN_X10 * nw)
    )
    r3 = F.col("n_symbols") * 100 <= GOPHER_MAX_SYMBOL_PCT * nw
    r4 = F.col("n_bullet_lines") * 100 <= GOPHER_MAX_BULLET_PCT * nl
    r5 = F.col("n_ellipsis_lines") * 100 <= GOPHER_MAX_ELLIPSIS_PCT * nl
    r6 = (nw > 0) & (
        F.col("n_alpha_words") * 100 >= GOPHER_MIN_ALPHA_PCT * nw
    )
    r7 = F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS
    return d.select(
        "*",
        r1.alias("ok_word_count"),
        r2.alias("ok_mean_word_len"),
        r3.alias("ok_symbol_ratio"),
        r4.alias("ok_bullet_lines"),
        r5.alias("ok_ellipsis_lines"),
        r6.alias("ok_alpha_words"),
        r7.alias("ok_stopwords"),
        (r1 & r2 & r3 & r4 & r5 & r6 & r7).alias("pass_gopher"),
    )


def gopher_oracle_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle for :func:`gopher_flags` over ``docs_sql``."""
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
    WITH d AS MATERIALIZED ({docs_sql}),
    stats AS (
      SELECT {id_col},
        len(list_filter(regexp_split_to_array({text_col}, '\\s+'),
                        w -> w != ''))::BIGINT AS n_words,
        len(list_filter(list_transform(string_split({text_col}, chr(10)),
                                       l -> trim(l)),
                        l -> l != ''))::BIGINT AS n_lines,
        coalesce(list_sum(list_transform(
          list_filter(regexp_split_to_array({text_col}, '\\s+'),
                      w -> w != ''),
          w -> len(w))), 0)::BIGINT AS n_word_chars,
        ((len({text_col}) - len(replace({text_col}, '#', '')))
         + (len({text_col}) - len(replace({text_col}, '...', ''))) // 3
        )::BIGINT AS n_symbols,
        len(list_filter(
          list_filter(list_transform(string_split({text_col}, chr(10)),
                                     l -> trim(l)), l -> l != ''),
          l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE chr(8226) || '%'
        ))::BIGINT AS n_bullet_lines,
        len(list_filter(
          list_filter(list_transform(string_split({text_col}, chr(10)),
                                     l -> trim(l)), l -> l != ''),
          l -> l LIKE '%...' OR l LIKE '%' || chr(8230)
        ))::BIGINT AS n_ellipsis_lines,
        len(list_filter(regexp_split_to_array({text_col}, '\\s+'),
                        w -> w != '' AND regexp_matches(w, '[A-Za-z]')
        ))::BIGINT AS n_alpha_words,
        len(list_intersect(
          list_distinct(list_filter(
            regexp_split_to_array(lower({text_col}), '\\s+'),
            w -> w != '')),
          [{stops}]))::BIGINT AS n_stopwords
      FROM d),
    flags AS (
      SELECT *,
        (n_words >= {GOPHER_MIN_WORDS}
         AND n_words <= {GOPHER_MAX_WORDS}) AS ok_word_count,
        (n_words > 0
         AND n_word_chars * 10 >= {GOPHER_MIN_MEAN_LEN_X10} * n_words
         AND n_word_chars * 10 <= {GOPHER_MAX_MEAN_LEN_X10} * n_words
        ) AS ok_mean_word_len,
        (n_symbols * 100 <= {GOPHER_MAX_SYMBOL_PCT} * n_words)
          AS ok_symbol_ratio,
        (n_bullet_lines * 100
         <= {GOPHER_MAX_BULLET_PCT} * greatest(n_lines, 1))
          AS ok_bullet_lines,
        (n_ellipsis_lines * 100
         <= {GOPHER_MAX_ELLIPSIS_PCT} * greatest(n_lines, 1))
          AS ok_ellipsis_lines,
        (n_words > 0
         AND n_alpha_words * 100 >= {GOPHER_MIN_ALPHA_PCT} * n_words)
          AS ok_alpha_words,
        (n_stopwords >= {GOPHER_MIN_STOPWORDS}) AS ok_stopwords
      FROM stats)
    SELECT *, (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
               AND ok_bullet_lines AND ok_ellipsis_lines
               AND ok_alpha_words AND ok_stopwords) AS pass_gopher
    FROM flags
    """


# C4 line-cleaning constants (Raffel et al. 2020 §2.2):
C4_MIN_LINE_WORDS = 3  # keep lines with >= 3 words
C4_MIN_KEPT_LINES = 5  # drop pages with < 5 surviving sentences/lines
C4_TERMINALS = (".", "!", "?", '"', "'")


def c4_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4's line-level cleaning (Raffel et al. 2020 §2.2): per document,

    * keep only (trimmed, non-empty) lines that end in a terminal
      punctuation mark (. ! ? " ') AND have >= 3 words AND do not
      contain the word 'javascript' (case-insensitive);
    * page gates: ``has_brace`` ('{' anywhere — code), ``has_lorem``
      ('lorem ipsum', case-insensitive), and >= 5 kept lines;
    * ``pass_c4`` = enough kept lines and neither page gate tripped;
      ``clean_text`` = kept lines joined with '\\n' (emitted regardless
      of the verdict so callers can inspect rejects).

    Integer/boolean decisions only — bit-stable and exactly mirrored by
    :func:`c4_oracle_sql`. 100 TB shape: pure projection, no shuffle;
    the line filter is one Catalyst ``filter`` lambda inside codegen.
    """
    lines = _lines(F.col(text_col))
    is_kept = (
        lambda ln: (
            ln.endswith(".")
            | ln.endswith("!")
            | ln.endswith("?")
            | ln.endswith('"')
            | ln.endswith("'")
        )
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != "")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(ln).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    d = docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.col(text_col).contains("{").alias("has_brace"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    return d.select(
        "*",
        (
            (F.col("n_kept_lines") >= C4_MIN_KEPT_LINES)
            & ~F.col("has_brace")
            & ~F.col("has_lorem")
        ).alias("pass_c4"),
    )


def c4_oracle_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle for :func:`c4_clean` over ``docs_sql``."""
    return f"""
    WITH d AS MATERIALIZED ({docs_sql}),
    per AS (
      SELECT {id_col},
        list_filter(list_transform(string_split({text_col}, chr(10)),
                    l -> trim(l)), l -> l != '') AS lines,
        list_filter(
          list_filter(list_transform(string_split({text_col}, chr(10)),
                      l -> trim(l)), l -> l != ''),
          l -> (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?'
                OR l LIKE '%"' OR l LIKE '%' || chr(39))
           AND len(list_filter(regexp_split_to_array(l, '\\s+'),
                               w -> w != '')) >= {C4_MIN_LINE_WORDS}
           AND NOT contains(lower(l), 'javascript')) AS kept,
        contains({text_col}, '{{') AS has_brace,
        contains(lower({text_col}), 'lorem ipsum') AS has_lorem
      FROM d)
    SELECT {id_col}, len(lines)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_kept_lines, has_brace, has_lorem,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           (len(kept) >= {C4_MIN_KEPT_LINES}
            AND NOT has_brace AND NOT has_lorem) AS pass_c4
    FROM per
    """
