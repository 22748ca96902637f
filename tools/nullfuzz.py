"""Null-fuzz the testdata into a sibling directory, then run the
differential gate against it:

    python tools/nullfuzz.py [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --empty [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --unicode [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --blank [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --dupes [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --skew [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --patho [src_sf_dir] [out_dir]
    python tools/nullfuzz.py --patho2 [src_sf_dir] [out_dir]
    python tools/check_oracle.py <out_dir>

Deterministically nulls ~5% of every non-key column (md5 of
table.column:rownum), leaving join/primary keys intact. The gate
passing on the fuzzed clone proves engine-vs-oracle agreement on
NULL semantics — null ordering in windows, null event-time rows,
sum-over-all-null, null text in similarity/dedup — not just on the
generator's happy path. ``--empty`` writes zero-row clones instead
(schema only) — the empty-partition degenerate case. ``--unicode``
appends non-ASCII payloads (combining chars, CJK, emoji, Latin-1
supplements) to 10% of document texts — the Java-regex vs RE2 vs
codepoint-length parity check for the text operators. ``--blank``
replaces ~12% of document texts with empty/whitespace-only strings
— the tokenizes-to-[''] class that NULL fuzzing cannot reach.
``--dupes`` injects real duplication: ~8% of document texts become
an exact copy of another document and ~8% a near-copy (one token
appended); every 11th embedding becomes an exact copy of another
vector. The generator's clean data has almost no genuine duplicates,
so without this clone the dedup/novelty/near-dup family's verdicts
never see the positive class they exist to find. ``--skew`` injects
heavy hitters: ~35% of events collapse onto one user and one event
type, ~30% of lineitem rows onto one part/supplier, ~20% of document
tokens onto one repeated token — the straggler-making distribution
the salted/skew-safe/AQE paths exist for, absent from the
quasi-uniform generator data. ``--patho`` injects pathological
DOCUMENT LENGTHS: one ~1 MB document (a short sentence repeated —
huge |doc|, tiny distinct-gram set, so the gram-explode family's
quadratic-in-|doc| prefix machinery is exercised without an
all-pairs blowup), an 80-document contiguous 0-length flood, and
max-length single-line unicode documents built from ≤2-char words
(long LINES, short WORDS — the word-length tripwires in the
BPE/unigram oracles stay inside their unrolled bounds by
construction, which is itself part of the contract under test).
``--patho2`` injects pathological DISTINCT-GRAM VOLUME — the axis
--patho's repeated-sentence megadoc deliberately avoids: a
~15k-unique-word megadoc plus scattered 400-unique-word docs, so
the corpus-wide vocab frame jumps ~30 → ~20k entries while words
stay short enough for the unrolled oracles to brute-force.
Every query passes all eight gates with the same verdict set as
clean data.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

KEYS = {
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "l_orderkey", "l_linenumber", "event_id", "doc_id",
    "vec_id",
}


def main() -> None:
    flags = {"--empty", "--unicode", "--blank", "--dupes", "--skew",
             "--patho", "--patho2"}
    args = [a for a in sys.argv[1:] if a not in flags]
    empty = "--empty" in sys.argv[1:]
    unicode_mode = "--unicode" in sys.argv[1:]
    blank_mode = "--blank" in sys.argv[1:]
    dupes_mode = "--dupes" in sys.argv[1:]
    skew_mode = "--skew" in sys.argv[1:]
    patho_mode = "--patho" in sys.argv[1:]
    patho2_mode = "--patho2" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    dst = args[1] if len(args) > 1 else (
        "/tmp/sf_empty" if empty
        else "/tmp/sf_unifuzz" if unicode_mode
        else "/tmp/sf_blank" if blank_mode
        else "/tmp/sf_dupes" if dupes_mode
        else "/tmp/sf_skew" if skew_mode
        else "/tmp/sf_patho" if patho_mode
        else "/tmp/sf_patho2" if patho2_mode
        else "/tmp/sf_nullfuzz"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    if empty:
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
            print(f"[empty] {t}")
        print(f"wrote {dst}; now run: python tools/check_oracle.py {dst}")
        return
    if blank_mode:
        import shutil

        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        # empty-STRING text (and whitespace-only) is a different bug
        # class from NULL text: split(trim('')) tokenizes to ['']
        # whose gram set is {''} — operators must decide (and agree
        # with their oracles on) whether blank docs match each other
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/documents.parquet'
                )
                SELECT doc_id,
                       CASE WHEN rid % 17 = 0 THEN ''
                            WHEN rid % 17 = 1 THEN '   '
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM n
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[blank] documents; wrote {dst}")
        return
    if skew_mode:
        import shutil

        for t in TABLES:
            if t not in ("events", "lineitem", "documents"):
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        # heavy hitters: collapse a deterministic slice of each
        # skew-sensitive key onto ONE value — the one-user flood /
        # hot-part / stopword-storm distributions
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/events.parquet'
                )
                SELECT event_id, ts,
                       CASE WHEN rid % 20 < 7 THEN 1
                            ELSE user_id END AS user_id,
                       CASE WHEN rid % 20 < 7 THEN 'view'
                            ELSE event_type END AS event_type,
                       value, props
                FROM n
            ) TO '{dst}/events.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/lineitem.parquet'
                )
                SELECT * REPLACE (
                    CASE WHEN rid % 10 < 3 THEN 1
                         ELSE l_partkey END AS l_partkey,
                    CASE WHEN rid % 10 < 3 THEN 1
                         ELSE l_suppkey END AS l_suppkey
                )
                FROM n
            ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/documents.parquet'
                )
                SELECT doc_id,
                       CASE WHEN rid % 5 = 0 AND text IS NOT NULL
                            THEN text || ' the the the the the the'
                                 || ' the the the the the the'
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM n
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[skew] events + lineitem + documents; wrote {dst}")
        return
    if dupes_mode:
        import shutil

        for t in TABLES:
            if t not in ("documents", "embeddings"):
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        # donor rid = (rid*7 mod N)+1 — deterministic, rarely self;
        # exact copies feed exact/minhash/simhash/CC positives, the
        # appended-token copies feed the near-dup (but not exact)
        # band, and duplicated embeddings feed cosine-1 ANN pairs
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid,
                           count(*) OVER () AS nn
                    FROM '{src}/documents.parquet'
                )
                SELECT d.doc_id,
                       CASE WHEN d.rid % 13 = 0 THEN donor.text
                            WHEN d.rid % 13 = 5
                            THEN donor.text || ' appended'
                            ELSE d.text END AS text,
                       d.lang, d.source, d.n_chars
                FROM n d
                LEFT JOIN n donor
                  ON donor.rid = ((d.rid * 7) % d.nn) + 1
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid,
                           count(*) OVER () AS nn
                    FROM '{src}/embeddings.parquet'
                )
                SELECT e.vec_id,
                       CASE WHEN e.rid % 11 = 0 THEN donor.embedding
                            ELSE e.embedding END AS embedding,
                       e.label
                FROM n e
                LEFT JOIN n donor
                  ON donor.rid = ((e.rid * 7) % e.nn) + 1
            ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[dupes] documents + embeddings; wrote {dst}")
        return
    if patho_mode:
        import shutil

        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        # pathological LENGTHS, not pathological content: the
        # megadoc is a 9-token sentence repeated to ~1 MB (so its
        # DISTINCT gram set stays tiny and the brute-force pair
        # oracles stay tractable while every per-doc explode /
        # prefix bound / chunker sees six orders of magnitude more
        # characters than the median); the 0-length flood is
        # CONTIGUOUS (one partition eats all of it); the unicode
        # max-line docs are one enormous line of ≤2-char words
        # (long lines, short words — inside the tokenizer oracles'
        # unrolled word-length bounds by construction)
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/documents.parquet'
                )
                SELECT doc_id,
                       CASE WHEN rid = 1
                            THEN repeat(
                              'the quick brown fox jumps over a lazy dog ',
                              24000)
                            WHEN rid >= 100 AND rid < 180 THEN ''
                            WHEN rid % 29 = 3
                            THEN repeat('é漢 字m 🙂a ', 600)
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM n
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[patho] documents; wrote {dst}")
        return
    if patho2_mode:
        import shutil

        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        # pathological DISTINCT-GRAM VOLUME — the axis --patho's
        # repeated-sentence megadoc deliberately avoids (tiny
        # distinct-gram set, for oracle tractability). One
        # ~15k-word megadoc where EVERY word (hence every word
        # n-gram and every suffix start) is unique, plus a
        # scattering of 400-unique-word docs (words disambiguated
        # per doc), so the corpus-wide distinct-word frame jumps
        # from ~30 to ~20k entries: the vocab-frame tokenizer
        # trainers, prefix/posting-list builders, and suffix
        # machinery all meet a HIGH-ENTROPY document at a size the
        # unrolled brute-force oracles can still replay (words stay
        # ≤ 10 chars, well inside the 18-position DP bounds).
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/documents.parquet'
                )
                SELECT doc_id,
                       CASE WHEN rid = 1
                            THEN (SELECT string_agg(
                                      'q' || lpad(to_hex(g), 5, '0'),
                                      ' ' ORDER BY g)
                                  FROM generate_series(1, 15000) t(g))
                            WHEN rid % 37 = 5
                            THEN (SELECT string_agg(
                                      'r' || n.rid || 'x' || to_hex(g),
                                      ' ' ORDER BY g)
                                  FROM generate_series(1, 400) t(g))
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM n
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[patho2] documents; wrote {dst}")
        return
    if unicode_mode:
        import shutil

        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        con.execute(
            f"""
            COPY (
                WITH n AS (
                    SELECT *, row_number() OVER () AS rid
                    FROM '{src}/documents.parquet'
                )
                SELECT doc_id,
                       CASE WHEN rid % 10 = 0
                            -- ΣΟΦΟΣ / İstanbul: Spark lower() is
                            -- context/locale-aware (final sigma ς,
                            -- dotted i̇) where DuckDB utf8proc is
                            -- not — probes that any case folding in
                            -- an oracle-checked query sticks to the
                            -- ASCII ascii_lower contract
                            THEN text ||
                                 ' déjà vu 漢字テスト Ωμέγα ΣΟΦΟΣ'
                                 || ' İstanbul 🙂 naïve ½²'
                            -- exotic-whitespace class: edge tabs and
                            -- newlines (Java/RE2 split but Python
                            -- strip() would eat), interior NBSP /
                            -- ideographic space / line separator
                            -- (Python \\s would split, ASCII must
                            -- not), and a vertical tab (Java \\s
                            -- splits, RE2 does not) — the tri-engine
                            -- tokenization-contract probes
                            WHEN rid % 10 = 3
                            THEN chr(9) || text || chr(10)
                            WHEN rid % 10 = 6
                            THEN 'a' || chr(160) || 'b' || chr(12288)
                                 || 'c' || chr(8232) || 'd ' || text
                            WHEN rid % 10 = 9
                            THEN text || ' v' || chr(11) || 'tab'
                            ELSE text END AS text,
                       lang, source, n_chars
                FROM n
            ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[unicode] documents; wrote {dst}")
        return
    for t in TABLES:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
        ).df()
        exprs = []
        for _, r in cols.iterrows():
            c = r["column_name"]
            if c in KEYS:
                exprs.append(c)
            else:
                exprs.append(
                    f"CASE WHEN CAST('0x' || substring(md5('{t}.{c}:' "
                    f"|| CAST(rowid AS VARCHAR)), 1, 4) AS INT) % 20 = 0 "
                    f"THEN NULL ELSE {c} END AS {c}"
                )
        sel = ", ".join(exprs)
        con.execute(
            f"""
            COPY (
                WITH numbered AS (
                    SELECT *, row_number() OVER () AS rowid
                    FROM '{src}/{t}.parquet'
                )
                SELECT {sel} FROM numbered
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        print(f"[fuzzed] {t}")
    print(f"wrote {dst}; now run: python tools/check_oracle.py {dst}")


if __name__ == "__main__":
    main()
