"""Generate a data-dominated scaling clone: a deterministic sf≈1
(default 10× of sf0.1) sibling of the driver testdata, so the
scaling-slope measurement gets at least one decade where DATA, not
fixed per-query overhead, dominates wall time (VERDICT r10, Next #1
— at sf0.1 the whole expensive family is sub-10 s/query, so a
hidden n² with a small constant still hides inside plan/JIT noise).

    python tools/scaleclone.py [src_sf_dir] [out_dir] [multiple]
    # defaults: /root/testdata/sf0.1  /root/repo/.scaleclone/sf1  10

Faithfulness matters more than speed here, and the ONE thing the
clone must NOT do is naively replicate documents: every replica
would be an exact/near duplicate of its 9 siblings, so pair volume
in the similarity joins would grow ~quadratically in the multiple —
manufacturing exactly the superlinearity the measurement exists to
rule out. Instead the generator LEARNS the source distributions and
samples fresh rows:

- ``documents``: empirical vocabulary (the 30-word driver lexicon),
  uniform word-count range, lang/source frequencies — all measured
  from the source table — plus planted duplication at the SOURCE
  DENSITY: ~5% of docs are a near-copy of an earlier doc with a
  ``dup`` token spliced in (the driver's own marker convention,
  observed jaccard ≈ 0.95-1.0 partners), and ~1-in-625 an exact
  copy. True-pair volume therefore grows linearly in corpus size,
  matching the generator data the sf0.001→0.1 decades measured.
- ``embeddings``: per-label mean vectors learned from the source,
  plus isotropic Gaussian residual at the observed per-dim std,
  re-normalized to the unit sphere (source vectors are unit-norm
  with weak label structure — mean-norm ≈ 0.07).
- ``lineitem``/``orders``: key-shifted replication (orderkeys offset
  by k·(max+1) per replica; dim FKs unchanged — facts grow, dims
  don't). Replication is safe here: relational queries carry no
  near-dup semantics.
- ``events``: key/time-shifted replication (event_id offset,
  ts shifted by k hours so window/session queries see a longer
  stream, user/value columns unchanged).
- dims (region nation customer supplier part): copied as-is.

Everything is seeded (Python ``random.Random`` per table) — two
runs produce byte-identical logical content. Output lives under
``.scaleclone/`` (gitignored; regenerate on demand).
"""

from __future__ import annotations

import os
import random
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def gen_documents(con: duckdb.DuckDBPyConnection, src: str, dst: str,
                  multiple: int) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        f"ORDER BY doc_id"
    ).fetchall()
    n_src = len(rows)
    # learned distributions ------------------------------------------------
    from collections import Counter

    wc: Counter[str] = Counter()
    lens: list[int] = []
    langs: Counter[str] = Counter()
    sources: Counter[str] = Counter()
    for _, text, lang, source in rows:
        words = text.split(" ")
        wc.update(words)
        lens.append(len(words))
        langs[lang] += 1
        sources[source] += 1
    # 'dup' is the driver's planted near-dup marker, not lexicon
    vocab = sorted(w for w in wc if w != "dup")
    lo, hi = min(lens), max(lens)
    lang_items = sorted(langs.items())
    lang_tot = sum(langs.values())
    src_names = sorted(sources)

    rng = random.Random(0xD0C5)
    n_new = n_src * multiple
    texts: list[str] = []
    out_lang: list[str] = []
    out_src: list[str] = []
    for i in range(n_new):
        if i % 20 == 11 and i >= 8:
            # planted near-dup (source density ~5%): copy an earlier
            # doc, splice the 'dup' marker at a random position
            base = texts[i - rng.randint(1, 8)].split(" ")
            base.insert(rng.randrange(len(base) + 1), "dup")
            texts.append(" ".join(base))
        elif i % 625 == 600:
            # planted exact dup (source density: 8 groups / 5000)
            texts.append(texts[i - rng.randint(1, 8)])
        else:
            k = rng.randint(lo, hi)
            texts.append(
                " ".join(vocab[rng.randrange(len(vocab))] for _ in range(k))
            )
        r = rng.randrange(lang_tot)
        acc = 0
        for lang, cnt in lang_items:
            acc += cnt
            if r < acc:
                out_lang.append(lang)
                break
        out_src.append(src_names[rng.randrange(len(src_names))])

    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": pd.array(range(n_new), dtype="int64"),
            "text": texts,
            "lang": out_lang,
            "source": out_src,
        }
    )
    df["n_chars"] = df["text"].str.len().astype("int64")
    con.register("docs_new", df)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, n_chars FROM docs_new "
        f"ORDER BY doc_id) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    print(f"[documents] {n_new} rows (fresh empirical sample, "
          f"planted dups at source density)")


def gen_embeddings(con: duckdb.DuckDBPyConnection, src: str, dst: str,
                   multiple: int) -> None:
    import numpy as np
    import pandas as pd

    src_rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    arr = np.array([r[1] for r in src_rows], dtype=np.float64)
    labels = np.array([r[2] for r in src_rows])
    dim = arr.shape[1]
    label_vals = sorted(set(labels.tolist()))
    means = {l: arr[labels == l].mean(axis=0) for l in label_vals}
    resid_std = float(
        np.mean([arr[labels == l].std(axis=0).mean() for l in label_vals])
    )
    label_counts = np.array([(labels == l).sum() for l in label_vals],
                            dtype=np.float64)
    label_p = label_counts / label_counts.sum()

    n_new = len(src_rows) * multiple
    np_rng = np.random.default_rng(0xE3B3D)
    new_labels = np_rng.choice(label_vals, size=n_new, p=label_p)
    vecs = np.empty((n_new, dim), dtype=np.float64)
    for l in label_vals:
        m = new_labels == l
        vecs[m] = means[l] + np_rng.normal(0.0, resid_std, (m.sum(), dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = pd.DataFrame(
        {
            "vec_id": pd.array(range(n_new), dtype="int64"),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": pd.array(new_labels, dtype="int32"),
        }
    )
    con.register("emb_new", df)
    con.execute(
        f"COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label "
        f"FROM emb_new ORDER BY vec_id) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"
    )
    print(f"[embeddings] {n_new} rows (label-mean + isotropic residual, "
          f"unit-normalized)")


def gen_relational(con: duckdb.DuckDBPyConnection, src: str, dst: str,
                   multiple: int) -> None:
    off = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    reps = " UNION ALL ".join(f"SELECT {k} AS rep" for k in range(multiple))
    con.execute(
        f"""
        COPY (
            SELECT o_orderkey + rep * {off} AS o_orderkey,
                   o.* EXCLUDE (o_orderkey)
            FROM '{src}/orders.parquet' o CROSS JOIN ({reps})
            ORDER BY o_orderkey
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT l_orderkey + rep * {off} AS l_orderkey,
                   l.* EXCLUDE (l_orderkey)
            FROM '{src}/lineitem.parquet' l CROSS JOIN ({reps})
            ORDER BY l_orderkey, l_linenumber
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    eoff = con.execute(
        f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
            SELECT event_id + rep * {eoff} AS event_id,
                   ts + INTERVAL (rep) HOUR AS ts,
                   e.* EXCLUDE (event_id, ts)
            FROM '{src}/events.parquet' e CROSS JOIN ({reps})
            ORDER BY event_id
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )
    print(f"[orders/lineitem/events] {multiple}x key-shifted replication")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scaleclone", "sf1"
    )
    multiple = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"[dims] copied {', '.join(COPY_TABLES)}")
    gen_documents(con, src, dst, multiple)
    gen_embeddings(con, src, dst, multiple)
    gen_relational(con, src, dst, multiple)
    print(f"wrote {dst} ({multiple}x of {src})")


if __name__ == "__main__":
    main()
