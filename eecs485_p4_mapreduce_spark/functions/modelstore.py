"""Persisted trained-model store: the stored-model table for quantizers.

The engine trains small models over a corpus — the Lloyd's k-means
quantizer (IVF / SemDeDup centroids) and the PQ per-subspace codebooks.
Training is deterministic but costs a few Spark jobs (~2.5 s at sf0.1);
the model itself is tiny (K x D doubles, driver-side).  The streaming
band index already showed the production shape: derive once, STORE,
read thereafter.  This module gives the quantizers the same treatment:

- Models live as parquet directories under the Spark SQL warehouse
  (``spark.sql.warehouse.dir``), named content-addressed by corpus path
  + file mtime: a rewritten corpus gets a NEW location, so a live
  reader of the old model is never clobbered (the band-index advice);
  stale versions are only junk on disk, bounded by corpus rewrites
  (production corpora are immutable snapshot dirs, so normally zero).
- Publish is atomic on a POSIX filesystem: write to a unique temp dir,
  ``os.rename`` into place.  A lost race (rename target exists) falls
  back to reading the winner — training is deterministic, so both
  writers' content is bit-identical anyway.  (Object stores lack atomic
  rename; a cluster deployment fronts this with its catalog/ingest
  instead, which is where stored models belong at 100 TB.)
- Reads cross APPLICATIONS: the in-memory quantizer caches are keyed by
  applicationId and die with the context, but a fresh application finds
  the published model on disk and skips training entirely.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import SparkSession

from eecs485_p4_mapreduce_spark.functions.memo import mtime_token


def warehouse_path(spark: SparkSession) -> str:
    """Local filesystem path of the session warehouse dir."""
    raw = spark.conf.get("spark.sql.warehouse.dir")
    parsed = urlparse(raw)
    return parsed.path if parsed.scheme in ("", "file") else raw


def model_location(
    spark: SparkSession, kind: str, sf_dir: str, token: int | None
) -> str:
    """Content-addressed model dir: corpus path hash + mtime token."""
    digest = hashlib.md5(os.path.realpath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(
        warehouse_path(spark), f"sg_model_{kind}_{digest}_{token or 0}"
    )


def _pa_schema(schema: str):
    """DDL-ish model schema ("k bigint, pa varchar, cv array<double>")
    -> pyarrow."""
    import pyarrow as pa

    types = {
        "bigint": pa.int64(),
        "varchar": pa.string(),
        "string": pa.string(),
        "array<double>": pa.list_(pa.float64()),
    }
    fields = []
    for part in schema.split(","):
        name, typ = part.strip().split(" ", 1)
        fields.append(pa.field(name, types[typ.strip()]))
    return pa.schema(fields)


def _read_rows(loc: str) -> list[tuple] | None:
    """Published model rows at ``loc`` (sorted), or None if absent."""
    import pyarrow.parquet as pq

    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        return None
    table = pq.read_table(loc)
    rows = [
        tuple(list(v) if isinstance(v, list) else v for v in rec.values())
        for rec in table.to_pylist()
    ]
    return sorted(rows)  # an empty model is valid for an empty corpus


def _publish_rows(loc: str, schema: str, rows: list[tuple]) -> None:
    """Atomically publish ``rows`` as the model at ``loc``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = loc + ".tmp-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    pa_schema = _pa_schema(schema)
    # zip(*[]) is [] — pad to one empty column per field so an empty
    # corpus publishes a schema-correct zero-row model instead of
    # crashing Table.from_arrays with a schema/array-count mismatch
    cols = list(zip(*rows)) or [[] for _ in pa_schema]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, pa_schema)],
        schema=pa_schema,
    )
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, loc)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race; winner's
        # content is identical (deterministic training) so ours is junk


def load_model(
    spark: SparkSession, kind: str, sf_dir: str, table: str = "embeddings"
) -> list[tuple] | None:
    """Published rows of model ``kind`` for the corpus at ``sf_dir``
    (freshness-keyed by ``table``'s mtime), or None when absent /
    unkeyable.  The split read half of :func:`load_or_train`, for
    consumers whose training and application happen in ONE pass (the
    BPE merge loop) and so can't hand a standalone ``train`` thunk."""
    token = mtime_token(sf_dir, table)
    if token is None:
        return None
    return _read_rows(model_location(spark, kind, sf_dir, token))


def store_model(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    schema: str,
    rows: list[tuple],
    table: str = "embeddings",
) -> None:
    """Publish ``rows`` as model ``kind`` (the split write half of
    :func:`load_or_train`); no-op when the corpus mtime is unreadable
    (nothing to key freshness on)."""
    token = mtime_token(sf_dir, table)
    if token is None:
        return
    _publish_rows(model_location(spark, kind, sf_dir, token), schema, rows)


def load_or_build_frame(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    table: str,
    schema: str,
    build: Callable[[], "object"],
    extra_tables: tuple = (),
):
    """Stored DERIVED TABLE: like :func:`load_or_train` but for
    executor-scale frames (the LSH candidate-edge set) that a driver-
    side pyarrow write could not hold.  The frame is written by Spark
    as parquet into a unique temp dir under the warehouse and atomically
    renamed into the content-addressed location; hits (any application,
    same corpus mtime) return a plain parquet scan of the published
    table — no re-derivation, and no checkpoint needed since the scan
    is stable and re-readable.  ``schema`` is applied on read so an
    empty published table (empty corpus) still has its columns.

    Returns the DataFrame, or ``build()``'s result unpublished when the
    corpus mtime is unreadable (caller keeps its own checkpoint there).
    Derivation is deterministic as a SET; a rename race loser reads the
    winner's copy (row order may differ between builders, but every
    consumer is order-insensitive — aggregates and joins only).

    ``extra_tables``: additional source tables the derivation reads —
    their mtime tokens are folded into the key (md5 of the ordered
    token list, 60-bit) so regenerating ANY input misses instead of
    serving a stale frame.  Single-table callers keep the raw token
    (published locations stay valid)."""
    token = mtime_token(sf_dir, table)
    for extra in extra_tables:
        et = mtime_token(sf_dir, extra)
        if token is None or et is None:
            token = None
            break
        token = int(
            hashlib.md5(f"{token}:{et}".encode()).hexdigest()[:15], 16
        )
    if token is None:
        return build()
    loc = model_location(spark, kind, sf_dir, token)
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        tmp = loc + ".tmp-" + uuid.uuid4().hex[:8]
        build().write.parquet(tmp)
        try:
            os.rename(tmp, loc)
        except OSError:
            if os.path.exists(os.path.join(loc, "_SUCCESS")):
                # true publish race: the winner's copy is complete —
                # drop ours and read theirs below
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # NOT a race (EACCES/EXDEV/missing parent): the rename
                # failed with no winner published.  Don't discard the
                # expensive Spark build and then die on a missing-path
                # read — serve this application from the tmp dir (a
                # complete parquet table with its own _SUCCESS).  The
                # next application retries the publish; reap OUR tmp at
                # interpreter exit (the checkpoint-reaper convention) so
                # a persistently failing rename doesn't accumulate
                # sg_model_*.tmp-* orphans under the warehouse forever.
                import atexit

                atexit.register(shutil.rmtree, tmp, ignore_errors=True)
                return spark.read.schema(schema).parquet(tmp)
    return spark.read.schema(schema).parquet(loc)


def load_or_train(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    schema: str,
    train: Callable[[], list[tuple]],
    table: str = "embeddings",
) -> list[tuple]:
    """Rows of the trained model for (``kind``, corpus at ``sf_dir``):
    read the published copy when one exists, else train, publish, and
    return.  Rows are returned sorted so cached vs fresh is
    deterministic for every consumer.  ``table`` names the corpus table
    whose mtime keys freshness (embeddings for the quantizers,
    documents for the text models).

    The model is driver-sized (KB), so publish/read go through pyarrow
    directly — no Spark job.  (A Spark write of a Python-local 8-row
    frame costs ~4 s: ``coalesce(1)`` funnels every parallelize
    partition's Python-runner round-trip through one task.  The dir is
    still plain parquet + _SUCCESS, readable by ``spark.read.parquet``
    on a cluster.)"""
    token = mtime_token(sf_dir, table)
    loc = model_location(spark, kind, sf_dir, token)
    if token is not None:
        rows = _read_rows(loc)
        if rows is not None:
            return rows
    rows = sorted(train())
    if token is None:
        return rows  # unreadable corpus mtime: don't publish what we can't key
    _publish_rows(loc, schema, rows)
    return rows
