"""Dictionary scan: multi-pattern phrase matching in ONE corpus pass.

The banned-phrase / watchlist stage of a production cleaning pipeline
has a shape none of the existing text operators cover: match a
DICTIONARY of variable-length phrases (hundreds to millions) against
every document, where per-pattern scans (``L × contains()`` passes or
a giant regex alternation) stop scaling with dictionary size.  The
classical answer is Aho–Corasick (1975): compile the dictionary into
a failure-link automaton once, then every document is matched against
ALL phrases simultaneously in a single pass — O(tokens) per document,
independent of dictionary size.

Here the automaton runs at TOKEN granularity (phrases are token
n-grams under the TOKEN_SEP contract), which keeps the oracle honest
and megadoc-safe: the brute-force SQL mirror counts matches with
indexed token-window joins (O(tokens · |lengths|), never an
O(position) substring probe — the --patho lesson).

Mining + application are split across the corpus halves (the
x_roundtrip held-in/held-out pattern): the dictionary is the top-k
most frequent 2/3/4-token phrases of the EVEN doc_id half, applied to
the ODD half — so the query exercises mine → compile → scan, and the
match counts are not a tautology of the mining aggregation.

Scale shape:
- mining: one gram pass over the A-half (all lengths in one staged
  projection), one (length, gram) count shuffle, then |lengths|
  ``TakeOrderedAndProject`` heads off the materialized count frame —
  no per-length rescans, no vocabulary-wide window;
- compile: the dictionary collects driver-side (BOUNDED: k per
  length, 24 rows here — the automaton must live in one closure);
- scan: one Arrow ``mapInPandas`` pass over the B-half token
  arrays; per-batch cost O(tokens + matches);
- rollup: one |dictionary|-key aggregation, LEFT-joined back so
  zero-match phrases stay visible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pac_data_pipeline_spark.ext.text import TOKEN_SEP

TOKEN_SEP_SQL = TOKEN_SEP.replace("\\", "\\\\")


def phrase_dictionary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lengths: tuple[int, ...] = (2, 3, 4),
    per_length: int = 8,
) -> DataFrame:
    """Top-``per_length`` token n-grams per length by TOTAL
    (overlapping) occurrence count, ties broken lexicographically.
    Only full windows count (a doc shorter than L contributes no
    L-phrases).  Returns (length, phrase, dict_count)."""
    windows = [
        f"CASE WHEN size(t) >= {L} THEN "
        f"transform(sequence(1, size(t) - {L} + 1), "
        f"i -> struct({L} AS length, "
        f"concat_ws(' ', slice(t, i, {L})) AS phrase)) "
        f"ELSE array() END"
        for L in lengths
    ]
    # one staged tokenization (the _with_token_ngrams let-binding:
    # the lambda sees only the attribute, so the split runs once per
    # row no matter how many lengths consume it)
    gram_expr = (
        "transform(array(__toks), t -> flatten(array("
        + ", ".join(windows)
        + ")))[0]"
    )
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .withColumn(
            "__toks",
            F.expr(f"split(trim({text_col}), '{TOKEN_SEP_SQL}')"),
        )
        .select(F.explode(F.expr(gram_expr)).alias("w"))
        .select(F.col("w.length").alias("length"), F.col("w.phrase"))
        .groupBy("length", "phrase")
        .agg(F.count(F.lit(1)).cast("long").alias("dict_count"))
        # |lengths| top-k consumers read this frame — materialize so
        # the gram pass runs once, not once per length
        .localCheckpoint()
    )
    heads = [
        counts.filter(F.col("length") == L)
        .orderBy(F.desc("dict_count"), "phrase")
        .limit(per_length)
        for L in lengths
    ]
    out = heads[0]
    for h in heads[1:]:
        out = out.unionAll(h)
    return out


def _build_automaton(phrases: list[tuple[str, ...]]):
    """Token-level Aho–Corasick: trie + BFS failure links + output
    sets.  Pure dict/list construction — deterministic."""
    trans: list[dict[str, int]] = [{}]
    fail: list[int] = [0]
    out: list[list[int]] = [[]]
    for pid, toks in enumerate(phrases):
        s = 0
        for t in toks:
            nxt = trans[s].get(t)
            if nxt is None:
                trans.append({})
                fail.append(0)
                out.append([])
                nxt = len(trans) - 1
                trans[s][t] = nxt
            s = nxt
        out[s].append(pid)
    # BFS failure links (depth order so fail[] of parents is final)
    queue = list(trans[0].values())
    qi = 0
    while qi < len(queue):
        s = queue[qi]
        qi += 1
        for tok, nxt in trans[s].items():
            queue.append(nxt)
            f = fail[s]
            while f and tok not in trans[f]:
                f = fail[f]
            # trans[f][tok] is strictly shallower than nxt (f is a
            # proper-suffix state of s), so this never self-links
            fail[nxt] = trans[f].get(tok, 0)
            out[nxt].extend(out[fail[nxt]])
    return trans, fail, out


def dictionary_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lengths: tuple[int, ...] = (2, 3, 4),
    per_length: int = 8,
) -> DataFrame:
    """Mine the phrase dictionary from the even-``id`` half, compile
    it, and scan the odd-``id`` half in one automaton pass.  Output,
    one row per dictionary phrase: (length, phrase, dict_count,
    n_docs, n_matches) — overlapping matches all count; zero-match
    phrases report 0/0."""
    a = df.filter((F.col(id_col) % 2) == 0)
    b = df.filter((F.col(id_col) % 2) == 1)
    dictionary = phrase_dictionary(
        a, text_col, id_col, lengths, per_length
    ).localCheckpoint()  # 2 consumers: the closure + the final join
    # BOUNDED collect: |lengths| · per_length rows (24 here) — the
    # automaton is a driver-built closure like the CMS counter matrix
    dict_rows = dictionary.collect()
    phrases = [tuple(r["phrase"].split(" ")) for r in dict_rows]
    names = [r["phrase"] for r in dict_rows]
    trans, fail, out = _build_automaton(phrases)

    schema = T.StructType(
        [
            T.StructField("phrase", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def scan_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import re

        sep = re.compile(TOKEN_SEP)
        for pdf in batches:
            rows_p, rows_d, rows_c = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                counts: dict[int, int] = {}
                s = 0
                # strip(' ') — SPACE only, the F.trim / trim(x, ' ')
                # contract (Python's bare strip() would also eat the
                # \t\n\f\r the tokenizer must see as separators)
                for tok in sep.split(text.strip(" ")):
                    while s and tok not in trans[s]:
                        s = fail[s]
                    s = trans[s].get(tok, 0)
                    st = s
                    for pid in out[st]:
                        counts[pid] = counts.get(pid, 0) + 1
                for pid, c in counts.items():
                    rows_p.append(names[pid])
                    rows_d.append(int(did))
                    rows_c.append(c)
            yield pd.DataFrame(
                {"phrase": rows_p, "doc_id": rows_d, "cnt": rows_c}
            )

    matches = (
        b.filter(F.col(text_col).isNotNull())
        .select(id_col, text_col)
        .mapInPandas(scan_batches, schema=schema)
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("cnt").cast("long").alias("n_matches"),
        )
    )
    return (
        dictionary.join(matches, "phrase", "left")
        .select(
            F.col("length").cast("int").alias("length"),
            "phrase",
            "dict_count",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_matches", F.lit(0)).cast("long")
            .alias("n_matches"),
        )
        .orderBy("length", "phrase")
    )


def dictionary_scan_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lengths: tuple[int, ...] = (2, 3, 4),
    per_length: int = 8,
) -> str:
    """Brute-force DuckDB mirror: the same mine → top-k → count
    pipeline with INDEXED token windows (no O(position) list slices
    — megadoc-safe) and a per-length window join on the odd half."""

    def win(L: int, src: str) -> str:
        cols = ", ".join(f"toks[i + {j}]" for j in range(L))
        return (
            f"SELECT {id_col}, {L} AS length, "
            f"unnest([concat_ws(' ', {cols}) "
            f"FOR i IN range(1, greatest(len(toks) - {L} + 1, 0) + 1)])"
            f" AS phrase FROM {src}"
        )

    # NOTE: DuckDB takes the regex RAW (single backslashes) — the
    # doubled TOKEN_SEP_SQL form is only for Spark's SQL-literal
    # parser, which unescapes once (a doubled form here would make
    # RE2 read \\t as "backslash or letter t" and split inside words)
    toks = (
        f"SELECT {id_col}, string_split_regex(trim({text_col}, ' '), "
        f"'{TOKEN_SEP}') AS toks FROM {table} "
        f"WHERE {text_col} IS NOT NULL"
    )
    a_wins = " UNION ALL ".join(
        win(L, f"(SELECT * FROM at WHERE {id_col} % 2 = 0)")
        for L in lengths
    )
    b_wins = " UNION ALL ".join(
        win(L, f"(SELECT * FROM at WHERE {id_col} % 2 = 1)")
        for L in lengths
    )
    per_len_heads = " UNION ALL ".join(
        f"""(SELECT length, phrase, dict_count
             FROM counts WHERE length = {L}
             ORDER BY dict_count DESC, phrase LIMIT {per_length})"""
        for L in lengths
    )
    return f"""
        WITH at AS MATERIALIZED ({toks}),
        aw AS MATERIALIZED ({a_wins}),
        counts AS MATERIALIZED (
            SELECT length, phrase, count(*) AS dict_count
            FROM aw GROUP BY 1, 2
        ),
        dict AS MATERIALIZED ({per_len_heads}),
        bw AS MATERIALIZED ({b_wins}),
        m AS (
            SELECT d.phrase AS phrase,
                   count(DISTINCT b.{id_col}) AS n_docs,
                   count(*) AS n_matches
            FROM dict d JOIN bw b
              ON b.length = d.length AND b.phrase = d.phrase
            GROUP BY d.phrase
        )
        SELECT CAST(d.length AS INT) AS length, d.phrase,
               CAST(d.dict_count AS BIGINT) AS dict_count,
               CAST(coalesce(m.n_docs, 0) AS BIGINT) AS n_docs,
               CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches
        FROM dict d LEFT JOIN m ON m.phrase = d.phrase
        ORDER BY d.length, d.phrase
    """
