"""Streaming corpus ingestion: the curation funnel's front half, incremental.

A document feed (object-store drops standing in for Kafka, as in
streaming/events.py) flows through the same operators the batch funnel
uses — quality gate, then batch-over-corpus dedup — continuously:

    readStream -> quality predicate (stateless, scan-local)
      -> foreachBatch:
           incremental_dedup(batch, standing digest table)
           append survivors to the corpus dir
           append their digests to the digest dir

Cross-BATCH duplicates are handled by the digest table, not stream state:
``dropDuplicatesWithinWatermark`` (events.dedup_events) bounds its state by
TIME, which is right for delivery retries but wrong for corpus dedup —
a document recrawled a month later must still dedup against the standing
corpus. The digest table is that unbounded-but-compact state (one md5 per
distinct content), exactly the batch operator's contract, reused verbatim
because foreachBatch hands us plain DataFrames.

At scale the corpus/digest dirs are lakehouse tables and the two appends
become one transaction; the plumbing here is plain parquet + the
single-writer guarantee of Structured Streaming's serialized foreachBatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from map_spark_sql_spark.operators.dedup import incremental_dedup
from map_spark_sql_spark.plans.curation import _quality_predicate

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream. ``max_files_per_trigger=1`` makes each
    dropped file its own micro-batch — how the cross-batch dedup tests force
    redelivery across batches."""
    # The file stream source monitors a *directory* (FileStreamSource sets
    # basePath = the source path, which must be a dir). Single-file fixtures
    # are exposed through a temp-dir symlink, as in events.read_event_stream.
    if os.path.isfile(path):
        import tempfile

        d = tempfile.mkdtemp(prefix="stream_src_")
        # abspath, or a relative source path becomes a symlink target
        # resolved against the TEMP dir — a dangling link the file source
        # silently lists as zero files (the stream then "drains" instantly
        # having produced no batches at all)
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def ingest_documents(
    stream: DataFrame,
    spark: SparkSession,
    out_dir: str,
    min_tokens: int = 5,
) -> "object":
    """Start the ingestion query. Layout under ``out_dir``:

    - ``corpus/``  — accepted documents (+ ``content_md5``), append-only
    - ``digests/`` — one ``content_md5`` per distinct accepted content
    - ``_checkpoint/`` — stream progress

    Returns the started StreamingQuery (caller awaits termination).
    """
    corpus_dir = os.path.join(out_dir, "corpus")
    digest_dir = os.path.join(out_dir, "digests")

    gated = stream.filter(F.expr(_quality_predicate("text", "spark", min_tokens)))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if os.path.isdir(digest_dir) and any(
            f.endswith(".parquet") for f in os.listdir(digest_dir)
        ):
            known = spark.read.parquet(digest_dir).select("content_md5")
        else:
            known = spark.createDataFrame([], "content_md5 string")
        kept = incremental_dedup(batch, known)
        # Survivors then their digests: if the writer dies between the two
        # appends, re-processing re-admits (not loses) rows — the corpus
        # read dedups on content_md5, so replay is safe.
        kept.persist()
        try:
            kept.write.mode("append").parquet(corpus_dir)
            kept.select("content_md5").write.mode("append").parquet(digest_dir)
        finally:
            kept.unpersist()

    return (
        gated.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def ingest_documents_near(
    stream: DataFrame,
    spark: SparkSession,
    out_dir: str,
    min_tokens: int = 5,
    num_hashes: int = 16,
    shingle: int = 2,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> "object":
    """NEAR-dup-aware streaming ingestion: like :func:`ingest_documents`
    but the standing state is the MinHash SIGNATURE table and the gate is
    :func:`~map_spark_sql_spark.operators.dedup.incremental_near_dedup` —
    a recrawl whose boilerplate was lightly edited still dedups, which the
    exact digest table structurally cannot do.

    Layout under ``out_dir``:

    - ``corpus/``     — accepted documents, append-only
    - ``signatures/`` — ``(doc_id, m0..m{k-1})`` per accepted doc (the
      persisted signature table; on a lakehouse this is the
      ``persist_minhash_signatures`` materialization)
    - ``_checkpoint/`` — stream progress

    Contract notes: the gate screens each batch AGAINST THE STANDING
    CORPUS only; near-duplicates arriving within one micro-batch both pass
    (in-batch near-dedup is a quadratic-in-batch problem that belongs to
    the periodic batch funnel — the steady-state micro-batch is small and
    re-screened by the next full curation run). Crash replay between the
    two appends re-admits rather than loses rows; ``read_corpus_near``
    collapses re-admissions on doc_id.
    """
    from map_spark_sql_spark.operators.dedup import (
        incremental_near_dedup,
        minhash_signatures,
    )

    corpus_dir = os.path.join(out_dir, "corpus")
    sig_dir = os.path.join(out_dir, "signatures")
    sig_schema = ", ".join(["doc_id long"] + [f"m{k} long" for k in range(num_hashes)])

    gated = stream.filter(F.expr(_quality_predicate("text", "spark", min_tokens)))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if os.path.isdir(sig_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sig_dir)
        ):
            standing = spark.read.parquet(sig_dir)
        else:
            standing = spark.createDataFrame([], sig_schema)
        verdict = incremental_near_dedup(
            batch, standing,
            num_hashes=num_hashes, shingle=shingle, bands=bands,
            threshold=threshold, max_bucket=max_bucket,
        ).filter(~F.col("is_near_dup")).select("doc_id")
        kept = batch.join(verdict, "doc_id", "left_semi")
        kept.persist()
        try:
            kept.write.mode("append").parquet(corpus_dir)
            minhash_signatures(
                kept, num_hashes=num_hashes, shingle=shingle
            ).write.mode("append").parquet(sig_dir)
        finally:
            kept.unpersist()

    return (
        gated.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_corpus_near(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the near-dedup corpus, collapsing crash-replay re-admissions:
    one row per doc_id."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(os.path.join(out_dir, "corpus"))
    w = Window.partitionBy("doc_id").orderBy("source")
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the accepted corpus, collapsing any crash-replay re-admissions
    (see ``_apply``): one row per content digest, min doc_id wins."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(os.path.join(out_dir, "corpus"))
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
