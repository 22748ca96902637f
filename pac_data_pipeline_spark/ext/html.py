"""HTML-to-text extraction — the CommonCrawl-pipeline step that
turns crawled markup into trainable plain text.

The reference pipeline ingests already-clean tabular text
(``pac_data_processor.py:60-88`` reads CSV rows, never markup); a
100 TB LLM-corpus pipeline starts one step earlier, at raw HTML.
This module provides that step with the same cross-engine contract
discipline as the TOKEN_SEP / ascii_lower tokenization contracts
(see :mod:`pac_data_pipeline_spark.ext.text`): every transformation
is an RE2-portable regex or a plain string replace, so a DuckDB
oracle reproduces the extraction byte-exactly and the driver's
value-hash gate can verify it.

Extraction contract (documented order, applied verbatim by both
engines — see ``HTML_STRIP_*`` / ``HTML_ENTITIES`` below):

1. drop ``<script>`` and ``<style>`` elements INCLUDING their
   content (``(?is)`` — case-insensitive, dot-matches-newline,
   non-greedy body so adjacent blocks don't merge);
2. replace every remaining tag ``<...>`` with a single space
   (block boundaries must not glue words together);
3. decode the fixed entity set IN ORDER — ``&lt; &gt; &quot;
   &#39; &nbsp;`` and ``&amp;`` LAST, so double-escaped input
   (``&amp;lt;``) decodes to the literal text ``&lt;`` exactly
   once, never recursively;
4. collapse ASCII whitespace runs (``[ \\t\\n\\f\\r]+`` — the
   TOKEN_SEP class, never ``\\s``, which is Unicode-aware on one
   engine and not the other) to one space and trim.

Regex portability: RE2 (DuckDB) has no backreferences or lookaround,
so the patterns use none; ``(?is)`` inline flags, ``[^>]*`` and
non-greedy ``.*?`` are supported identically by RE2 and ``java.util
.regex`` (Spark).

Scale shape: both wrap and extract are shuffle-free scan-stage
projections (whole-stage-codegen string expressions, no UDF, no
Python) — the plan is a single FileScan + Project at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Entity decode table, IN APPLICATION ORDER. ``&amp;`` must be
#: last: decoding it earlier would make ``&amp;lt;`` decode twice
#: (→ ``<``), corrupting text that legitimately discusses HTML.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Pass 1: script/style elements with their content. Non-greedy so
#: two sibling blocks don't swallow the text between them.
HTML_STRIP_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
HTML_STRIP_STYLE = r"(?is)<style[^>]*>.*?</style>"
#: Pass 2: any remaining tag (comments and doctypes fall out here
#: too — ``<!-- ... -->`` and ``<!DOCTYPE html>`` both match
#: ``<[^>]*>`` when they contain no ``>``; the synthetic wrap emits
#: none that do).
HTML_STRIP_TAG = r"(?s)<[^>]*>"
#: Pass 4: ASCII whitespace collapse (TOKEN_SEP class).
HTML_WS = r"[ \t\n\f\r]+"


def html_escape_col(col: Column) -> Column:
    """``&``/``<``/``>`` escaped for embedding text INTO markup —
    the inverse direction of extraction, used by the synthetic
    wrapper. ``&`` first, or the escapes would double-escape."""
    out = col
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


#: The synthetic page template as (kind, value) pieces — the ONE
#: definition both the Spark wrapper and the SQL oracle builder
#: render, so the two engines cannot drift. ``id`` = the document id
#: cast to string; ``body`` = the escaped (possibly empty) text;
#: ``dom`` = ``doc_id % 7`` cast to string (spreads the outbound
#: links over seven synthetic domains so the link-graph rollup has
#: real key variety).
WRAP_TEMPLATE: tuple[tuple[str, str], ...] = (
    ("lit", "<!DOCTYPE html><html><head><title>Document "),
    ("id", ""),
    ("lit", "</title><style type=\"text/css\">body { margin: 0; "
            "font-size: 14px; }</style></head><body>"),
    ("lit", "<nav><a href=\"/\">Home</a> | "
            "<a href=\"/about\">About</a></nav>"),
    ("lit", "<script type=\"text/javascript\">var trackerId = \""),
    ("id", ""),
    ("lit", "\"; track(trackerId);</script><h1>Document "),
    ("id", ""),
    ("lit", "</h1><p>"),
    ("body", ""),
    ("lit", "</p><p>Tom &amp; Jerry say &quot;hello&quot; "
            "&lt;loudly&gt;&nbsp;and &amp;lt;escaped&amp;gt; "
            "stays text.</p>"),
    ("lit", "<p>See <a href=\"https://site"),
    ("dom", ""),
    ("lit", ".example.com/doc/"),
    ("id", ""),
    ("lit", "\">related</a> and <a href=\"/local/"),
    ("id", ""),
    ("lit", "\">a local copy</a>.</p>"),
    ("lit", "<footer>&#39;doc "),
    ("id", ""),
    ("lit", "&#39; footer</footer></body></html>"),
)


def html_wrap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Deterministically wrap each document's text in realistic page
    markup: head with title + CSS, nav boilerplate, a tracking
    script, headings, the escaped body text, an entity-rich
    trailer paragraph, and a footer. Pure string concat — the same
    expression is reproducible in any SQL engine (see
    :func:`html_wrap_sql`), which is what makes the extract step
    oracle-checkable end-to-end. NULL text wraps as an empty
    paragraph (coalesce — DuckDB's ``concat`` skips NULLs while
    Spark's returns NULL, so the contract pins the non-null path)."""
    idc = F.col(id_col).cast("string")
    dom = (F.col(id_col) % 7).cast("string")
    body = html_escape_col(F.coalesce(F.col(text_col), F.lit("")))
    by_kind = {"id": idc, "body": body, "dom": dom}
    pieces = [
        F.lit(v) if kind == "lit" else by_kind[kind]
        for kind, v in WRAP_TEMPLATE
    ]
    return df.withColumn(html_col, F.concat(*pieces))


def html_wrap_sql(id_expr: str, text_expr: str) -> str:
    """The SAME wrap as an ANSI/DuckDB SQL expression, rendered from
    :data:`WRAP_TEMPLATE`. ``||`` (not ``concat``) would also work,
    but every operand is non-null by construction so either is
    safe."""

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    body = (
        f"replace(replace(replace(coalesce({text_expr}, ''), "
        "'&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    by_kind = {
        "id": f"CAST({id_expr} AS VARCHAR)",
        "body": body,
        "dom": f"CAST({id_expr} % 7 AS VARCHAR)",
    }
    parts = [
        _q(v) if kind == "lit" else by_kind[kind]
        for kind, v in WRAP_TEMPLATE
    ]
    return "concat(" + ", ".join(parts) + ")"


def html_extract_col(col: Column) -> Column:
    """The extraction contract (module docstring) as a column
    expression — JVM-side regexp_replace/replace chain, no UDF."""
    out = F.regexp_replace(col, HTML_STRIP_SCRIPT, " ")
    out = F.regexp_replace(out, HTML_STRIP_STYLE, " ")
    out = F.regexp_replace(out, HTML_STRIP_TAG, " ")
    for ent, raw in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(raw))
    out = F.regexp_replace(out, HTML_WS, " ")
    return F.trim(out)


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Extract plain text from an HTML column: one row per input
    document with the extracted text and its character count —
    the corpus-prep step downstream quality/dedup tiers consume."""
    extracted = html_extract_col(F.col(html_col))
    return df.select(
        id_col,
        extracted.alias("extracted"),
        F.length(extracted).alias("n_chars"),
    )


#: Hyperlink extraction contract: double-quoted href values only
#: (the synthetic wrap emits no other style), case-insensitive
#: attribute name. Group 1 = the URL.
HTML_HREF = '(?i)href="([^"]*)"'
#: Domain of an absolute http(s) URL; '' for relative links (both
#: engines return '' on regexp_extract no-match — probed, not
#: assumed).
URL_DOMAIN = r"^https?://([^/]+)"


def html_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """The web-graph edge step: one row per (document, outbound
    link) with the link's domain ('' = relative/internal). Link
    harvesting is ``regexp_extract_all`` + ``explode`` in the scan
    stage — no shuffle until whatever rollup the caller adds."""
    return df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HTML_HREF), F.lit(1))
        ).alias("url"),
    ).withColumn("domain", F.regexp_extract("url", URL_DOMAIN, 1))


#: Anchor elements with BOTH the href and the inner text: one
#: pattern, two groups — each engine extracts the groups in two
#: same-pattern passes whose match sequences are identical by
#: construction, then zips them positionally.
HTML_ANCHOR = '(?is)<a [^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def html_anchors(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(document, url, anchor text) triples — anchor text is the
    label signal web corpora attach to link-graph edges (it says
    what the TARGET page is about, which is why search engines and
    link-conditioned corpus filters both want it). The inner text
    goes through the same entity-decode + whitespace-collapse
    contract as full extraction, so '&amp;' in an anchor reads as
    '&' and nested inline tags vanish.

    Scale shape: two same-pattern ``regexp_extract_all`` passes over
    the scan (Catalyst dedups the common subexpression where it
    can), ``arrays_zip`` + ``explode`` — shuffle-free."""
    urls = F.regexp_extract_all(F.col(html_col), F.lit(HTML_ANCHOR), F.lit(1))
    texts = F.regexp_extract_all(F.col(html_col), F.lit(HTML_ANCHOR), F.lit(2))
    pair = F.explode(F.arrays_zip(urls.alias("url"), texts.alias("raw")))
    out = df.select(id_col, pair.alias("p")).select(
        id_col, F.col("p.url").alias("url"), F.col("p.raw").alias("raw")
    )
    cleaned = F.regexp_replace(F.col("raw"), HTML_STRIP_TAG, " ")
    for ent, rawc in HTML_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(rawc))
    cleaned = F.trim(F.regexp_replace(cleaned, HTML_WS, " "))
    return out.select(
        id_col, "url", cleaned.alias("anchor_text")
    )


def html_links_domain_rollup(links: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-domain outbound-link profile — the blocklist/allowlist
    input a crawl pipeline maintains. One map-side-combinable
    shuffle on the (low-cardinality) domain key."""
    return links.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_distinct(id_col).alias("n_docs"),
    )


#: URL canonicalization contract (applied in this order — each step
#: is an RE2-portable regex with a LITERAL replacement, never a
#: backreference, because Spark spells group refs ``$1`` and DuckDB
#: spells them ``\1``):
#:
#: 1. strip the fragment (``#…``);
#: 2. lowercase the scheme and host of absolute http(s) URLs (the
#:    path/query stay case-sensitive per RFC 3986);
#: 3. drop a default port (``:80``/``:443``) from the host;
#: 4. strip ``utm_*`` tracking params in three passes whose ORDER is
#:    load-bearing: (C) every non-leading ``&utm_…`` globally — after
#:    this at most one LEADING utm param can remain; (A) a leading
#:    ``?utm_…&`` with a successor param becomes ``?``; (B) a lone
#:    trailing ``?utm_…`` disappears;
#: 5. drop a dangling ``?``.
URL_STRIP_FRAGMENT = r"#.*$"
URL_SCHEME_HOST = r"(?i)^(https?)://([^/?#]*)"  # groups: scheme, host
#: (case-insensitive: the scheme being folded may arrive as HTTPS://)
URL_DEFAULT_PORT = r":(80|443)$"
URL_UTM_MID = r"&utm_[^&#]*"        # pass C (global)
URL_UTM_LEAD = r"\?utm_[^&#]*&"     # pass A → '?'
URL_UTM_LONE = r"\?utm_[^&#]*$"     # pass B → ''
URL_DANGLING_Q = r"\?$"


def url_normalize_col(col: Column) -> Column:
    """The canonicalization contract as a column expression. Relative
    URLs only get steps 1/4/5 (they have no scheme/host)."""
    u = F.regexp_replace(col, URL_STRIP_FRAGMENT, "")
    scheme = F.lower(F.regexp_extract(u, URL_SCHEME_HOST, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, URL_SCHEME_HOST, 2)),
        URL_DEFAULT_PORT,
        "",
    )
    rest = F.regexp_replace(u, URL_SCHEME_HOST, "")
    u = F.when(
        scheme == "", u  # relative: no scheme/host to fold
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))
    u = F.regexp_replace(u, URL_UTM_MID, "")
    u = F.regexp_replace(u, URL_UTM_LEAD, "?")
    u = F.regexp_replace(u, URL_UTM_LONE, "")
    return F.regexp_replace(u, URL_DANGLING_Q, "")


def url_normalize_sql(url_expr: str) -> str:
    """The SAME contract as DuckDB SQL, rendered from the same
    pattern constants (``'g'`` everywhere — Spark always replaces
    all matches, DuckDB only the first without it; the single
    ``?``-anchored patterns can match at most once so ``'g'`` is
    harmless there)."""
    u = f"regexp_replace({url_expr}, '{URL_STRIP_FRAGMENT}', '', 'g')"
    scheme = f"lower(regexp_extract({u}, '{URL_SCHEME_HOST}', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({u}, '{URL_SCHEME_HOST}', 2)),"
        f" '{URL_DEFAULT_PORT}', '', 'g')"
    )
    rest = f"regexp_replace({u}, '{URL_SCHEME_HOST}', '', 'g')"
    u = (
        f"CASE WHEN {scheme} = '' THEN {u} "
        f"ELSE concat({scheme}, '://', {host}, {rest}) END"
    )
    u = f"regexp_replace({u}, '{URL_UTM_MID}', '', 'g')"
    u = f"regexp_replace({u}, '{URL_UTM_LEAD}', '?', 'g')"
    u = f"regexp_replace({u}, '{URL_UTM_LONE}', '', 'g')"
    return f"regexp_replace({u}, '{URL_DANGLING_Q}', '', 'g')"


#: Deterministic URL fixture — five structural variants chosen by
#: ``doc_id % 5``, each rendered from ONE template by both engines
#: (same discipline as WRAP_TEMPLATE). The variants cover every
#: contract clause: mixed-case scheme/host + default port + trailing
#: utm pair + fragment; leading utm pair that strips to nothing;
#: leading utm with a surviving successor; a relative URL with lone
#: utm + fragment; an already-canonical URL (must pass unchanged).
URL_FIXTURE_CASES: tuple[tuple[tuple[str, str], ...], ...] = (
    (("lit", "HTTPS://Site"), ("dom", ""), ("lit", ".Example.COM:443/doc/"),
     ("id", ""), ("lit", "?id="), ("id", ""),
     ("lit", "&utm_source=feed&utm_campaign=x#frag")),
    (("lit", "http://MIRROR.example.org:80/d/"), ("id", ""),
     ("lit", "?utm_ref=a&utm_b=c")),
    (("lit", "https://cdn.example.net/static/"), ("id", ""),
     ("lit", "?utm_x=1&page=2")),
    (("lit", "/relative/path/"), ("id", ""), ("lit", "?utm_z=9#x")),
    (("lit", "https://plain.example.com/"), ("id", "")),
)


def url_fixture_col(id_col: str = "doc_id") -> Column:
    """The fixture as a Spark column (case picked by ``id % 5``)."""
    idc = F.col(id_col).cast("string")
    dom = (F.col(id_col) % 7).cast("string")
    by_kind = {"id": idc, "dom": dom}
    expr = None
    for i, case in enumerate(URL_FIXTURE_CASES):
        built = F.concat(*[
            F.lit(v) if kind == "lit" else by_kind[kind]
            for kind, v in case
        ])
        cond = F.col(id_col) % 5 == i
        expr = F.when(cond, built) if expr is None else expr.when(cond, built)
    return expr


def url_fixture_sql(id_expr: str = "doc_id") -> str:
    """The SAME fixture as a SQL CASE expression."""

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    by_kind = {
        "id": f"CAST({id_expr} AS VARCHAR)",
        "dom": f"CAST({id_expr} % 7 AS VARCHAR)",
    }
    whens = []
    for i, case in enumerate(URL_FIXTURE_CASES):
        built = "concat(" + ", ".join(
            _q(v) if kind == "lit" else by_kind[kind] for kind, v in case
        ) + ")"
        whens.append(f"WHEN {id_expr} % 5 = {i} THEN {built}")
    return "CASE " + " ".join(whens) + " END"


def html_extract_sql(html_expr: str) -> str:
    """The SAME contract as ANSI/DuckDB SQL, generated from the same
    constants so the two engines cannot drift: returns an expression
    string computing the extracted text from ``html_expr``. DuckDB's
    ``regexp_replace`` needs the explicit ``'g'`` option (it replaces
    only the first match by default; Spark always replaces all)."""

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    out = f"regexp_replace({html_expr}, {_q(HTML_STRIP_SCRIPT)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_q(HTML_STRIP_STYLE)}, ' ', 'g')"
    out = f"regexp_replace({out}, {_q(HTML_STRIP_TAG)}, ' ', 'g')"
    for ent, raw in HTML_ENTITIES:
        out = f"replace({out}, {_q(ent)}, {_q(raw)})"
    out = f"regexp_replace({out}, {_q(HTML_WS)}, ' ', 'g')"
    return f"trim({out})"
