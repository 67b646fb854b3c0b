"""Distributed BPE-merge training (Sennrich, Haddow & Birch, ACL 2016) —
the learned-vocabulary upgrade of ``bpe_token_estimate``.

A training-data pipeline wants real learned merges, not a closed-form
heuristic: each round counts adjacent symbol pairs over the corpus
vocabulary (weighted by word frequency), picks the most frequent pair
(ties broken lexicographically, so the result is deterministic at any
parallelism), and re-segments every word by merging that pair greedily
left-to-right.

Representation trick shared by the Spark plan and the DuckDB oracle: a
word's current segmentation is ONE string with every token wrapped in a
``\\x1f`` unit separator (``\\x1ft0\\x1f\\x1ft1\\x1f...``). Merging pair
(l, r) is then a plain literal ``replace(seq, SEP+l+SEP+SEP+r+SEP,
SEP+l+r+SEP)`` — sequential non-overlapping replacement in both engines,
which is exactly BPE's greedy left-to-right merge (the consumed
separators prevent the overlap re-use a naive token-pair rewrite would
allow, e.g. 'aaa' + (a,a) -> [aa, a], never [aa, aa]).

100 TB shape: the corpus is touched ONCE (tokenize + one map-side-
combinable groupBy(word) -> the Zipf-bounded vocabulary, exactly how
production BPE trainers run); every later round works on the vocab:
pair extraction is a pure per-row slice/zip expression, pair counting
one (lhs, rhs)-keyed combinable groupBy, argmax a 1-row broadcast
crossJoin (no driver round-trip), re-segmentation a per-row string
replace. ``localCheckpoint`` per round keeps the plan O(1) in rounds.
Integer counts => bit-identical at any partitioning.

Reference analogue: the tokenizer feeding the NB classifier
(listingfiltering/learnNetwork.py:183-196) is the reference's only text
segmentation; this operator is its beyond-reference learned-vocab form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
_SEP_SQL = "chr(31)"


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the one
    corpus-sized job. Mirrors the BM25-family tokenizer exactly
    (trim -> split \\s+ -> drop empties)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def bpe_train_merges(
    docs: DataFrame, rounds: int = 8, text_col: str = "text"
) -> DataFrame:
    """Train ``rounds`` BPE merges; returns one row per learned merge:
    (merge_rank, lhs, rhs, pair_count), ordered by merge_rank."""
    sep2 = SEP + SEP
    words = _vocab(docs, text_col).select(
        F.concat(
            F.lit(SEP), F.array_join(F.split("word", ""), sep2), F.lit(SEP)
        ).alias("seq"),
        "freq",
    )
    words = words.localCheckpoint(eager=True)

    out: DataFrame | None = None
    for rnd in range(1, rounds + 1):
        toks = F.split(F.btrim(F.col("seq"), F.lit(SEP)), sep2)
        t = words.select(
            F.slice(toks, 1, F.size(toks) - 1).alias("la"),
            F.slice(toks, 2, F.size(toks) - 1).alias("ra"),
            "freq",
        )
        pairs = (
            t.select(F.explode(F.arrays_zip("la", "ra")).alias("p"), "freq")
            .groupBy(
                F.col("p.la").alias("lhs"), F.col("p.ra").alias("rhs")
            )
            .agg(F.sum("freq").cast("long").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.desc("pair_count"), "lhs", "rhs")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = best.select(
            F.lit(rnd).alias("merge_rank"), "lhs", "rhs", "pair_count"
        )
        out = row if out is None else out.unionByName(row)
        words = words.crossJoin(F.broadcast(best.select("lhs", "rhs"))).select(
            F.replace(
                F.col("seq"),
                F.concat(F.lit(SEP), "lhs", F.lit(sep2), "rhs", F.lit(SEP)),
                F.concat(F.lit(SEP), "lhs", F.col("rhs"), F.lit(SEP)),
            ).alias("seq"),
            "freq",
        )
        words = words.localCheckpoint(eager=True)
    assert out is not None
    return out.orderBy("merge_rank")


def bpe_oracle_sql(docs_cte: str, rounds: int = 8) -> str:
    """Unrolled-CTE DuckDB oracle for :func:`bpe_train_merges`: each round
    materializes the same pair count -> lexicographic argmax -> anchored
    string replace, so every learned merge is reproduced exactly."""
    s = _SEP_SQL
    s2 = f"{s}||{s}"
    parts = [
        f"WITH docs0 AS MATERIALIZED ({docs_cte}),",
        "toks0 AS (SELECT unnest(list_filter("
        r"string_split_regex(trim(lower(text)), '\s+'), x -> x != ''))"
        " AS word FROM docs0 WHERE text IS NOT NULL),",
        "vocab AS (SELECT word, COUNT(*)::BIGINT AS freq FROM toks0"
        f" WHERE NOT contains(word, {s}) GROUP BY word),",
        f"w0 AS MATERIALIZED (SELECT {s} ||"
        f" array_to_string(string_split(word, ''), {s2}) || {s} AS seq,"
        " freq FROM vocab),",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f"t{r} AS (SELECT string_split(trim(seq, {s}), {s2}) AS toks,"
            f" freq FROM w{r - 1}),",
            f"p{r} AS (SELECT u.p[1] AS lhs, u.p[2] AS rhs,"
            " SUM(freq)::BIGINT AS pair_count"
            f" FROM t{r}, unnest(list_zip(toks[:-2], toks[2:])) AS u(p)"
            " GROUP BY 1, 2),",
            f"b{r} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p{r}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1),",
            f"w{r} AS MATERIALIZED (SELECT replace(w.seq,"
            f" {s}||b.lhs||{s2}||b.rhs||{s}, {s}||b.lhs||b.rhs||{s}) AS seq,"
            f" w.freq FROM w{r - 1} w, b{r} b),",
        ]
    selects = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "\n".join(parts)[:-1] + f"\nSELECT * FROM ({selects}) ORDER BY merge_rank"


def bpe_segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python re-tokenizer: apply learned merges in order, each one
    greedy left-to-right — the inference-side dual of the trainer, used
    by tests to assert token counts shrink monotonically."""
    syms = list(word)
    for l, r in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed inference-side dual of :func:`bpe_train_merges`: apply
    a learned merge list to every document and return (id, n_tokens_bpe)
    — the token counting a data pipeline runs to budget/pack a corpus
    under a trained vocabulary.

    100 TB shape: ZERO shuffle — the whole computation is one scan-side
    Catalyst expression per row (words -> anchored char seqs -> the
    merge list folded as literal string replaces -> token count =
    separator count / 2, summed across the doc's words). The merge list
    is a driver-side literal (a trained vocab is a few thousand rows at
    most, and here 8)."""
    sep2 = SEP + SEP

    def apply_merges(s):
        for l, r in merges:
            s = F.replace(
                s,
                F.lit(f"{SEP}{l}{sep2}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            )
        return s

    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: (t != F.lit("")) & (~t.contains(SEP)),
    )
    seqs = F.transform(
        words,
        lambda w: F.concat(
            F.lit(SEP), F.array_join(F.split(w, ""), sep2), F.lit(SEP)
        ),
    )
    ntok = lambda s: (  # noqa: E731
        F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))
    ) / 2
    total = F.aggregate(
        seqs,
        F.lit(0).cast("long"),
        lambda acc, s: acc + ntok(apply_merges(s)).cast("long"),
    )
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), total.alias("n_tokens_bpe")
    )


def bpe_apply_oracle_sql(docs_cte: str, rounds: int = 8) -> str:
    """DuckDB oracle for train-then-apply: reuses the full training chain
    of :func:`bpe_oracle_sql` (so the learned merges are re-derived
    inside the oracle, never smuggled in as constants), then applies the
    b1..bN merges to every word as nested scalar-subquery replaces and
    counts tokens as separator-count / 2."""
    s = _SEP_SQL
    s2 = f"{s}||{s}"
    train = bpe_oracle_sql(docs_cte, rounds)
    # keep everything up to (not including) the final SELECT of the
    # training oracle; re-terminate with the apply chain
    head = train[: train.rindex("\nSELECT * FROM (")]
    expr = "sq0"
    for r in range(1, rounds + 1):
        expr = (
            f"replace({expr},"
            f" (SELECT {s}||lhs||{s2}||rhs||{s} FROM b{r}),"
            f" (SELECT {s}||lhs||rhs||{s} FROM b{r}))"
        )
    return f"""{head},
    dtoks AS (
      SELECT doc_id, unnest(list_filter(
        string_split_regex(trim(lower(text)), '\\s+'),
        x -> x != '' AND NOT contains(x, {s}))) AS word
      FROM docs0 WHERE text IS NOT NULL
    ),
    dseqs AS (
      SELECT doc_id,
             {s} || array_to_string(string_split(word, ''), {s2}) || {s} AS sq0
      FROM dtoks
    ),
    applied AS (SELECT doc_id, {expr} AS sq FROM dseqs),
    cnt AS (
      SELECT doc_id,
             (SUM(length(sq) - length(replace(sq, {s}, ''))) / 2)::BIGINT
               AS n_tokens_bpe
      FROM applied GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(c.n_tokens_bpe, 0)::BIGINT AS n_tokens_bpe
    FROM (SELECT doc_id FROM docs0 WHERE text IS NOT NULL) d
    LEFT JOIN cnt c USING (doc_id)"""
