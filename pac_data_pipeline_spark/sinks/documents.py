"""Sinks: document-record assembly and distributed writers
(SURVEY §2.2 K1-K8, §2.3 P7, §2.6 A10).

The reference uploads row-by-row (or in 1000-row batches) to a
document store. Distributed, the sink contract is:

* record assembly (struct/JSON shaping) is a **transform** — lazy,
  codegen'd, testable;
* the only side effect is ``foreachPartition`` with client-side
  batching, or a parquet write partitioned by the path columns —
  each executor writes its partitions independently, no driver
  funnel.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.scalar import iso_timestamp


def to_doc_records(
    df: DataFrame,
    collection: str,
    id_col: str,
    iso_date_cols: Sequence[str] = (),
) -> DataFrame:
    """P7/E9/K1: row → ``{collection, document_id, data}`` document
    (reference pac_data_processor.py:113-127). Timestamps named in
    ``iso_date_cols`` are ISO-8601 serialized; ``data`` is a JSON
    object of every column.

    Cross-engine JSON-TEXT caveat: double columns render through
    Java's ``Double.toString``, which switches to scientific
    notation outside [1e-3, 1e7) while most SQL engines print plain
    decimal — fine for row-level amounts like ``o_totalprice``
    (bounded ≪ 1e7), but any payload carrying SUMS or micro-scale
    floats must render canonically instead (the integer-cents
    pattern in :func:`nested_path_records`, added after the skew
    fuzz clone pushed a rollup payload over the threshold)."""
    body = df
    for c in iso_date_cols:
        body = body.withColumn(c, iso_timestamp(c))
    payload_cols = [c for c in body.columns]
    # keep null fields in the payload (ignoreNullFields=false): the
    # reference serializes None values rather than dropping keys, and
    # a stable key set is what downstream consumers index on
    return body.select(
        F.lit(collection).alias("collection"),
        F.col(id_col).cast("string").alias("document_id"),
        F.to_json(
            F.struct(*payload_cols), {"ignoreNullFields": "false"}
        ).alias("data"),
    )


def with_batch_id(
    df: DataFrame, batch_size: int, order_cols: Sequence[str]
) -> DataFrame:
    """K3: fixed-size upload batches (pac_snowflake_pipeline.py:
    163-207). ``batch_id = floor((row_number-1)/size)`` over an
    explicit global order.

    Scale note: a single global row_number serializes into ONE
    window partition — fine for sink batching at upload volumes,
    but at 100 TB use ``df.repartition(n)`` + per-partition batching
    in :func:`foreach_partition_write` instead (no total order is
    actually required by the sink; the reference's batches exist
    only to bound request size)."""
    w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
    return df.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)),
    )


def with_partition_batch_id(df: DataFrame, batch_size: int) -> DataFrame:
    """K3 at scale: fixed-size batches with ZERO shuffle. The sink
    never needed a total order — batches exist only to bound request
    size — so the batch id packs (partition, local batch) decoded
    from ``monotonically_increasing_id`` (pid in the high 31 bits,
    per-partition offset in the low 33). Every task numbers its own
    rows; no Exchange, no single-partition window.

    Ids are unique and stable within one materialization but depend
    on partitioning — use :func:`with_batch_id` when the id itself
    must be reproducible (and affordable: it is a global sort), or
    :func:`with_upload_shard` for a deterministic orderless
    assignment."""
    mid = F.monotonically_increasing_id()
    pid = F.shiftrightunsigned(mid, 33)
    off = mid.bitwiseAND(F.lit((1 << 33) - 1))
    # pid < 2^31 partitions and < 2^33/batch_size batches each; the
    # 28-bit pack keeps both in a single positive long at any
    # realistic partition count (2^31 * 2^28 < 2^63 requires
    # pid < 2^35 — always true: Spark caps partitions well below).
    return df.withColumn(
        "batch_id", F.shiftleft(pid, 28) + F.floor(off / F.lit(batch_size))
    )


def with_upload_shard(
    df: DataFrame, key_cols: Sequence[str], n_shards: int = 32
) -> DataFrame:
    """Deterministic orderless batch assignment: shard = md5 of the
    business key, mod ``n_shards``. Engine- and partitioning-
    independent (reruns and other engines agree), computed in the
    scan stage with no shuffle; shard sizes are ~n/n_shards. The
    per-request 1000-row cap is enforced downstream by
    :func:`foreach_partition_write`, which chunks whatever partition
    it sees — fixed-size REQUESTS never required a global order."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    shard = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % n_shards
    return df.withColumn("upload_shard", shard)


def nested_path_records(
    df: DataFrame,
    brand_col: str = "brand",
    cycle_col: str = "cycle",
    democrat_col: str = "democrat_total",
    republican_col: str = "republican_total",
) -> DataFrame:
    """K4: ``brands/{brand}/records/{cycle}/pac → {democrat,
    republican}`` (pac_snowflake_realtime.py:200). The write path
    becomes columns + a JSON payload; a partitioned write on
    (brand, cycle) reproduces the tree layout.

    The money fields render as CANONICAL two-decimal JSON numbers
    built from exact integer cents — NOT ``to_json`` over doubles:
    Java's ``Double.toString`` switches to scientific notation above
    1e7 (``6.32634773E7``) where other engines print plain decimal,
    a parity trap invisible on small fixtures and found by the skew
    fuzz clone the first time a rollup crossed the threshold.
    Negative amounts render with an explicit sign over the absolute
    cents (floor-of-signed-division would emit ``-1.-50``) — this is
    a general sink helper, so it cannot lean on any one caller's
    ``> 0`` HAVING gate."""

    def money(col):
        cents = F.round(F.col(col) * 100).cast("long")
        mag = F.abs(cents)
        return F.concat(
            F.when(cents < 0, F.lit("-")).otherwise(F.lit("")),
            F.floor(mag / F.lit(100)).cast("long").cast("string"),
            F.lit("."),
            F.lpad((mag % 100).cast("string"), 2, "0"),
        )

    return df.select(
        F.concat_ws(
            "/",
            F.lit("brands"),
            F.col(brand_col),
            F.lit("records"),
            F.col(cycle_col).cast("string"),
            F.lit("pac"),
        ).alias("path"),
        F.concat(
            F.lit('{"democrat":'),
            money(democrat_col),
            F.lit(',"republican":'),
            money(republican_col),
            F.lit("}"),
        ).alias("payload"),
    )


def keyed_json_tree(df: DataFrame, id_col: str, max_rows: int = 100_000) -> DataFrame:
    """K5/A10: whole-tree keyed write ``{id: {...}}``
    (index_align_to_firebase.py:240-259) — map_from_entries over
    collect_list. Returns a 1-row DataFrame with the JSON document.

    Driver-size warning by design: this materializes the whole tree
    into one value, exactly like the reference; only for small
    dimensional payloads. The ``max_rows`` guard refuses fact-table
    input (the probe scans at most ``max_rows + 1`` rows, so it is
    cheap even when the input is huge); raise it explicitly if a
    bigger tree is truly intended."""
    probed = df.limit(max_rows + 1).count()
    if probed > max_rows:
        raise ValueError(
            f"keyed_json_tree: input exceeds max_rows={max_rows} — this "
            "operator builds ONE driver-sized value; point it at a "
            "dimension or raise max_rows deliberately"
        )
    payload_cols = [c for c in df.columns if c != id_col]
    entry = F.struct(
        F.col(id_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
    )
    return df.agg(
        F.to_json(F.map_from_entries(F.sort_array(F.collect_list(entry)))).alias(
            "tree"
        )
    )


def write_parquet(
    df: DataFrame, path: str, partition_by: Sequence[str] = (), mode: str = "overwrite"
) -> None:
    """K1 at scale: keyed parquet layout; partition columns become
    the directory tree (= the reference's document paths), enabling
    partition pruning on read-back."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def foreach_partition_write(
    df: DataFrame,
    write_batch: Callable[[list[dict]], int],
    batch_size: int = 1000,
    success_threshold: float = 0.8,
) -> dict:
    """K2: batched atomic writes with the reference's ≥80% success
    gate (pac_snowflake_pipeline.py:292-312, :365). ``write_batch``
    receives up to ``batch_size`` row-dicts and returns how many it
    committed. Runs on executors — the driver only sees counters."""
    sc = df.sparkSession.sparkContext
    attempted = sc.accumulator(0)
    written = sc.accumulator(0)

    def run(partition):
        buf: list[dict] = []

        def flush():
            if buf:
                attempted.add(len(buf))
                written.add(int(write_batch(list(buf))))
                buf.clear()

        for row in partition:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                flush()
        flush()

    df.foreachPartition(run)
    total, ok = attempted.value, written.value
    rate = (ok / total) if total else 1.0
    return {
        "attempted": total,
        "written": ok,
        "success_rate": rate,
        "success": rate >= success_threshold,
    }


def verify_write(
    spark, path: str, expected_count: int, fmt: str = "parquet"
) -> dict:
    """K7: write-verification read-back (reference
    index_align_to_firebase.py:249-251) — re-read the sink and
    compare counts."""
    actual = spark.read.format(fmt).load(path).count()
    return {
        "expected": expected_count,
        "actual": actual,
        "ok": actual == expected_count,
    }


def dry_run(df: DataFrame, n: int = 5) -> dict:
    """K8: plan without side effects — sample rows, count, and the
    formatted physical plan (the reference prints samples + counts;
    we add the plan because that's the thing worth reviewing)."""
    import contextlib
    import io

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
    except Exception:  # plan preview is best-effort
        pass
    plan = buf.getvalue()
    return {
        "sample": [r.asDict(recursive=True) for r in df.limit(n).collect()],
        "count": df.count(),
        "plan": plan,
    }
