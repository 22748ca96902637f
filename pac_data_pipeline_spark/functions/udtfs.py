"""Python user-defined TABLE functions — the lateral-join tier of
the Python integration surface (scalar pandas UDF → grouped map →
grouped agg → stateful map → UDTF).

A UDTF is the right Python escape hatch when one input row fans out
into a VARIABLE number of output rows with Python-side logic (a
parser, a tokenizer with state, a recursive walker) — shapes that a
scalar UDF can't express and an explode(array) forces through an
intermediate array column.

Scale posture: UDTF eval runs row-at-a-time in the Python worker,
so the JVM-side equivalent (``posexplode(split(...))`` — see
ext/text.py token ops) is the production hot path for anything a
built-in can express; this module exists to pin the UDTF contract
(schema, lateral-join shape, partition-local execution) for the
operators that genuinely need Python. The engine's differential
gate hash-checks the UDTF output against the same SQL oracle as
the JVM path, proving the two tiers agree.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

# The engine-wide ASCII tokenization contract (ext/text.TOKEN_SEP).
# Deliberately NOT Python's Unicode-aware ``\s``/``str.strip()``:
# those treat NBSP/U+3000/U+2028 as separators and strip edge
# tabs/newlines, while the JVM split path and the DuckDB RE2 oracle
# do neither — the tiers must agree byte-for-byte on ANY input.
_WS = re.compile(r"[ \t\n\f\r]+")


@udtf(returnType="idx: int, term: string, term_len: int", useArrow=True)
class TokenStream:
    """Fan one document out into (position, token, length) rows.

    Tokenization contract = strip ASCII spaces, then split on runs
    of ``[ \\t\\n\\f\\r]`` — byte-identical to the JVM
    ``split(trim(text), TOKEN_SEP)`` path and the DuckDB
    ``string_split_regex(trim(text, ' '), ...)`` oracle, which is
    what makes the tier hash-comparable (leading tabs/newlines yield
    a leading '' token in all three tiers; Unicode whitespace is
    never a separator in any of them).

    ``useArrow=True`` plans ``ArrowEvalPythonUDTF``: rows move to
    the Python worker in Arrow batches instead of pickled one at a
    time — the same batching discipline as every other Python-tier
    operator in this engine.
    """

    def eval(self, text: str):  # noqa: D102 — contract in class doc
        if text is None:
            return
        stripped = text.strip(" ")
        if not stripped:
            return
        for i, tok in enumerate(_WS.split(stripped), start=1):
            yield i, tok, len(tok)


def token_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Lateral-join ``TokenStream`` over a corpus: one output row
    per (document, token position).

    Uses SQL ``LATERAL`` — the UDTF runs partition-local against
    each row (no shuffle introduced; the fan-out happens inside the
    scan stage's Python worker), so the operator scales exactly like
    the JVM explode it mirrors.
    """
    spark = df.sparkSession
    spark.udtf.register("pac_token_stream", TokenStream)
    df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")) \
        .createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.term, t.term_len
        FROM __udtf_docs d, LATERAL pac_token_stream(d.text) t
        """
    )
