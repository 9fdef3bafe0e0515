"""Continuous corpus ingest: quality gate + incremental dedup as a
Structured Streaming ``foreachBatch`` job with a PERSISTENT content-key
index — the production path for building a training corpus from a feed
that never stops.

Per micro-batch: score arriving documents with the shared batch/stream
quality gate (queries/llm_pipeline.py:quality_flags), dedup them against
the accumulated key index (left-anti join — historical documents are
touched ONLY as their compact key index, same delta discipline as
``pipeline_incremental_dedup``) and within the batch itself (rank-1 per
key), then write the admitted docs and their keys under per-epoch directories.
``foreachBatch`` is at-least-once — a failed-then-replayed epoch would
double-APPEND — so each epoch OVERWRITES its own ``epoch=N`` partition
directory: replaying epoch N reproduces the same deterministic admit and
clobbers its own previous partial output, which upgrades the pipeline to
effectively exactly-once (the standard idempotent-foreachBatch recipe).

At 100 TB the index is a bucketed table on the 16-byte fingerprint and the
anti-join co-locates on the bucket key; here the content key is the 2-token
prefix (this corpus has no exact duplicates — see
pipeline_cross_source_dedup)."""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vat_etl_spark.queries.llm_pipeline import corpus_admit_plan


def admit_batch(batch: DataFrame, out_dir: str, epoch_id: int) -> None:
    """Deterministic per-micro-batch admit step (also directly unit-testable
    without a stream): quality gate → anti-join vs persisted index →
    in-batch rank-1 per key → idempotent per-epoch write (overwrite of
    this epoch's own partition, so a replay cannot double-admit). The
    selection itself is `corpus_admit_plan` — the same function the
    driver-verified `corpus_ingest_admit_twin` oracle query runs."""
    spark = batch.sparkSession
    idx_path = f"{out_dir}/key_index"
    existing = None
    if pathlib.Path(idx_path).exists():
        # exclude THIS epoch's own prior (partial/replayed) index rows from
        # the dedup reference or a replay would block itself
        # ignoreMissingFiles: a purged-under-us superseded directory (its
        # keys are guaranteed present in a consolidated partition this
        # listing also sees — compact_key_index's grace protocol) must not
        # fail the scan. The exclusion filters on the src_epoch DATA
        # column, not the partition directory: compaction may have folded
        # this epoch's keys into a consolidated partition, and a replay
        # must still be able to exclude its own keys or it would block
        # itself and clobber its output with an empty admit.
        # mergeSchema: in a mixed pre/post-migration layout, schema
        # inference sampling a legacy (content_key-only) file would
        # silently drop the src_epoch DATA column and a replayed folded
        # epoch could fail to exclude its own keys (round-6 ADVICE)
        idx = (
            spark.read.option("basePath", idx_path)
            .option("ignoreMissingFiles", "true")
            .option("mergeSchema", "true")
            .parquet(idx_path)
        )
        if "src_epoch" not in idx.columns:
            # index written before the provenance column existed: the
            # partition directory IS the provenance (nothing was compacted
            # by the old code path after this code runs, so epoch == src)
            idx = idx.withColumn("src_epoch", F.col("epoch"))
        else:
            idx = idx.withColumn(
                "src_epoch", F.coalesce(F.col("src_epoch"), F.col("epoch"))
            )
        existing = (
            idx.filter(F.col("src_epoch") != epoch_id)
            .select("content_key")
            .distinct()
        )
    admitted = corpus_admit_plan(batch, existing)
    # stable snapshot: both writes below re-execute `admitted`, and the
    # second must not observe rows the first just wrote
    admitted = admitted.localCheckpoint(eager=True)
    admitted.write.mode("overwrite").parquet(f"{out_dir}/docs/epoch={epoch_id}")
    admitted.select(
        "content_key", F.lit(epoch_id).alias("src_epoch")
    ).write.mode("overwrite").parquet(f"{idx_path}/epoch={epoch_id}")


def corpus_ingest_stream(
    spark: SparkSession, src_dir: str, out_dir: str, schema=None
):
    """Wire :func:`admit_batch` into a file-source stream. Returns the
    started query; drain with ``availableNow`` triggers in tests."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch_id: admit_batch(df, out_dir, epoch_id)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


_SUPERSEDED_MARKER = "_SUPERSEDED"

# line-index layout (round 13, verdict-r12 task 2): lines are stored as a
# 128-bit hash pair (lk, lk2 — two independent xxhash64s) instead of raw
# text, laid out in _LINE_IDX_BUCKETS hash-bucket partitions on
# pmod(lk, B). Collision bound, same argument as the exact-twin content
# key: two DISTINCT lines colliding on both 64-bit hashes ≈ n²/2^129 —
# ~4e-15 at 10^12 index lines; a collision removes one innocent line
# from one document. The hashed keys cut the per-ROW key payload ~20×
# (16 bytes vs ~300-byte avg line text — the width the per-batch
# anti-join shuffles on) and the persistent index 2.0× on disk
# (84.9 → 41.9 MB at 500 K docs, STREAM_THROUGHPUT_r12 vs r13 —
# src_epoch/bucket columns and parquet overhead dominate at this line
# length); the drift-free same-session A/B measured the gate 1.26×
# faster over 10 epochs (LINE_GATE_AB_r13). The
# bucket layout gives maintenance a per-bucket unit of work (and a
# storage-partitioned join path on a real cluster). 16 buckets: enough
# for per-bucket maintenance grain while keeping per-epoch files
# task-sized — 64 buckets measured 2.4× throughput loss from tiny-file
# explosion at 20 epochs (the compactor folds epochs, so steady-state
# file count is ~bucket count, not epochs × buckets).
_LINE_IDX_BUCKETS = 16


def compact_key_index(
    spark: SparkSession, out_dir: str, grace_seconds: float = 300.0
) -> int:
    """Index maintenance, safe to run WHILE the ingest stream is live: fold
    the key index's accumulated ``epoch=N`` partitions into a single
    consolidated negative-epoch partition (distinct keys, coalesced files).
    Run periodically — each micro-batch reads the whole index, so thousands
    of tiny epoch files would otherwise turn every admit into a small-files
    scan (the same pathology compact_parquet_dir exists for). Negative
    epoch ids can never collide with a replayed real epoch id, so the
    replay-excludes-own-epoch rule in admit_batch is unaffected.

    Live-safety protocol (one maintenance thread at a time):

    1. **Purge with grace**: delete only directories a PREVIOUS compaction
       marked ``_SUPERSEDED`` — their keys have lived in a consolidated
       partition for a full inter-compaction cycle, so no reader that
       listed the index since then depends on them, and admit_batch reads
       with ``ignoreMissingFiles`` as the belt-and-braces.
    2. **Snapshot**: list the epoch directories ONCE and fold exactly
       those explicit paths — an epoch the stream writes mid-compaction is
       neither folded nor touched, just left for the next cycle.
    3. **Publish then mark**: the consolidated partition is renamed INTO
       the index first (rename-first crash safety: a crash at any point
       leaves every key readable, at worst duplicated — harmless, every
       reader applies ``distinct``), and the snapshotted directories are
       then only MARKED superseded, never removed in the same cycle.

    Returns the distinct key count of the consolidated partition."""
    return _compact_index(spark, f"{out_dir}/key_index", "content_key",
                          grace_seconds)


def compact_line_index(
    spark: SparkSession, out_dir: str, grace_seconds: float = 300.0
) -> int:
    """The line index's maintenance twin of :func:`compact_key_index` —
    identical grace/snapshot/publish-then-mark protocol over
    ``line_index/epoch=N`` partitions, folding on the hashed (lk, lk2)
    line keys and preserving the hash-bucket partition layout.
    src_epoch provenance survives the fold so a replay of a folded epoch
    still excludes its own lines (see :func:`admit_lines_batch`). A
    pre-r13 raw-line index is a different layout — rebuild it (the
    select on lk/lk2 fails loudly on legacy partitions)."""
    return _compact_index(spark, f"{out_dir}/line_index", ["lk", "lk2"],
                          grace_seconds, partition_col="bucket")


def _compact_index(
    spark: SparkSession,
    idx_path: str,
    key_cols: str | list[str],
    grace_seconds: float,
    partition_col: str | None = None,
) -> int:
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    import shutil
    import time

    root = pathlib.Path(idx_path)
    # 1. purge what a previous cycle superseded — but only if the marker is
    # older than grace_seconds. The next-cycle rule alone is not enough when
    # compaction can run twice inside one in-flight admit (its listing may
    # predate the first cycle's consolidated partition); the default (300 s)
    # is conservative — set it above the deployment's maximum micro-batch
    # duration so no reader that listed before a publish can still be
    # running at purge time. Tests that quiesce the stream between cycles
    # pass 0.0 explicitly.
    now = time.time()
    for p in root.iterdir():
        marker = p / _SUPERSEDED_MARKER
        if (
            p.is_dir()
            and p.name.startswith("epoch=")
            and marker.exists()
            and now - marker.stat().st_mtime >= grace_seconds
        ):
            shutil.rmtree(p)
    # 2. pin this cycle to a one-shot snapshot of the remaining epoch dirs
    snapshot = [
        p for p in root.iterdir() if p.is_dir() and p.name.startswith("epoch=")
    ]
    if not snapshot:
        return 0
    # nothing to fold: when every remaining partition is already a
    # consolidated (negative-epoch) one and there is only one of them,
    # re-folding copies the whole index into a new partition while the
    # marked original lingers a full grace cycle — doubling every
    # admit's scan until the next purge (measured: the 2.6 M-key line
    # index read 5.2 M rows per batch after a fold+refold sequence).
    # Purge-only cycles are exactly what the grace protocol wants here.
    if len(snapshot) == 1 and int(snapshot[0].name.split("=", 1)[1]) < 0:
        return 0
    # src_epoch provenance survives consolidation so a late replay of a
    # folded epoch can still exclude its own keys (see admit_batch).
    # Pre-migration partitions carry no src_epoch column; their directory
    # name IS the provenance (explicit-path reads lose the partition
    # column, so it is re-derived per path).
    frames = []
    cols = key_cols + ([partition_col] if partition_col else [])
    for p in snapshot:
        df = spark.read.parquet(str(p))
        if "src_epoch" not in df.columns:
            src = int(p.name.split("=", 1)[1])
            df = df.select(*cols, F.lit(src).alias("src_epoch"))
        else:
            df = df.select(*cols, "src_epoch")
        frames.append(df)
    keys = frames[0]
    for df in frames[1:]:
        keys = keys.unionByName(df)
    keys = keys.distinct()
    staging = f"{idx_path}_compacting"
    # Size the consolidated partition to the data (round-12 measured
    # finding, artifacts/STREAM_COMPACTION_r12.json): the old
    # unconditional coalesce(1) wrote ONE file with one row group, which
    # serialized every future admit's index scan onto a single task —
    # steady-state batch latency got WORSE than the fragmented layout it
    # replaced (11.3 s vs 7.6 s on a 2.6 M-line index) even as the cold
    # first batch improved 3× from the file-count cut. ~1 M keys per
    # output file keeps the scan parallel and still folds 20 epochs of
    # footers into a handful; at cluster scale this is where the index
    # would instead be bucketed on the join key.
    keys = keys.persist()
    n_files = max(1, (keys.count() + 999_999) // 1_000_000)
    if partition_col:
        # preserve the hash-bucket layout through the fold at the FILE
        # grain (see admit_lines_batch): bucket-pure, bucket-sorted files
        # sized to the data — max(n_files, buckets) output files
        keys = keys.repartition(
            max(n_files, _LINE_IDX_BUCKETS), F.col(partition_col)
        ).sortWithinPartitions(partition_col, *key_cols)
    else:
        keys = keys.repartition(n_files)
    keys.write.mode("overwrite").parquet(staging)
    keys.unpersist()
    n = spark.read.parquet(staging).count()
    taken = {
        int(p.name.split("=", 1)[1])
        for p in root.iterdir()
        if p.is_dir() and p.name.startswith("epoch=")
    }
    slot = -1
    while slot in taken:
        slot -= 1
    # 3. publish the consolidated partition, then mark (not delete) inputs
    pathlib.Path(staging).rename(f"{idx_path}/epoch={slot}")
    for p in snapshot:
        (p / _SUPERSEDED_MARKER).touch()
    return n


def admit_lines_batch(batch: DataFrame, out_dir: str, epoch_id: int) -> None:
    """Line-grain continuous dedup — the streaming form of
    ``pipeline_line_dedup`` (C4 keep-first, arXiv:1910.10683) for a crawl
    that never stops: every arriving document sheds any line the corpus
    has already admitted, keeps its own first copy of lines that repeat
    WITHIN the micro-batch, and the surviving lines join the persistent
    line index for all future epochs.

    Same exactly-once recipe as :func:`admit_batch`: the admit is a
    deterministic function of (batch, index-minus-own-epoch), and both
    outputs overwrite their own ``epoch=N`` partition — a replayed epoch
    excludes its own prior index rows (or its lines would remove
    themselves) and clobbers its own partial output. Equivalence to the
    batch query: when epochs arrive in ascending doc_id order, the
    streamed keep-first survivor equals pipeline_line_dedup's global
    ``min(doc_id·10^6 + line_idx)`` — pinned in tests/test_streaming.py.

    Index layout (round 13 — the 100 TB gap the r12 verdict named): the
    persistent index stores 128-bit HASHED line keys (lk, lk2; collision
    bound at _LINE_IDX_BUCKETS) in hash-bucket partitions, never raw
    line text — the per-batch anti-join and the within-batch survivor
    election both shuffle 16-byte keys instead of strings, and the
    index-side ``distinct`` the r12 spelling paid per batch is gone
    outright (admitted keys are globally unique by construction: a line
    is KEPT in exactly one epoch, and replays overwrite their own
    partition). Fold old epochs with :func:`compact_line_index` (the key
    index's grace protocol, shared via ``_compact_index``; src_epoch
    provenance makes replays of folded epochs safe)."""
    from vat_etl_spark.queries.llm_pipeline import _LINE_W as w

    spark = batch.sparkSession
    idx_path = f"{out_dir}/line_index"
    toked = batch.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    lines = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, (size(t) + {w - 1}) div {w}),"
                f" i -> concat_ws(' ', slice(t, (i - 1) * {w} + 1, {w})))"
            )
        ).alias("i0", "line"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("line_idx"),
        "line",
        F.xxhash64("line").alias("lk"),
        F.xxhash64(F.lit(-1), F.col("line")).alias("lk2"),
    )
    if pathlib.Path(idx_path).exists():
        # no mergeSchema: the hashed layout is uniform by construction
        # (every partition carries lk/lk2/src_epoch — admit and compactor
        # both write it), and schema merging re-read every footer per
        # batch (measured +9 s on a 20-epoch index)
        idx = (
            spark.read.option("basePath", idx_path)
            .option("ignoreMissingFiles", "true")
            .parquet(idx_path)
        )
        # explicit layout check (round 14, ADVICE-r13): a pre-r13 index
        # stored raw line text; resuming over one would otherwise die
        # mid-batch with an opaque unresolved-column AnalysisException
        if "lk" not in idx.columns or "lk2" not in idx.columns:
            raise ValueError(
                f"legacy line_index layout at {idx_path} (columns "
                f"{idx.columns}): pre-r13 indexes stored raw line text; "
                "rebuild the index (delete line_index/ and replay, or "
                "re-ingest) — the hashed lk/lk2 layout is required"
            )
        # replay exclusion on DATA-column provenance (coalesced with the
        # partition epoch): compact_line_index may have folded this
        # epoch's lines into a consolidated negative-epoch partition, and
        # a replay must still exclude its own lines or it would remove
        # them from its own documents (same rule as admit_batch)
        prov = F.coalesce(F.col("src_epoch"), F.col("epoch"))
        seen = idx.filter(prov != epoch_id).select("lk", "lk2")
        fresh = lines.join(seen, ["lk", "lk2"], "left_anti")
    else:
        fresh = lines
    surv = fresh.groupBy("lk", "lk2").agg(
        F.min(F.col("doc_id") * 1_000_000 + F.col("line_idx")).alias("keep_key")
    )
    occ = lines.join(surv, ["lk", "lk2"], "left").select(
        "doc_id", "line_idx", "line", "lk", "lk2",
        (
            F.col("doc_id") * 1_000_000 + F.col("line_idx") == F.col("keep_key")
        ).alias("kept"),
    )
    kept_struct = F.when(F.col("kept"), F.struct("line_idx", "line"))
    cleaned = occ.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            " ",
        ).alias("cleaned_text"),
    )
    # stable snapshot: the docs write and the index write both execute the
    # admit subtree; the index must record exactly the lines the docs kept
    cleaned = cleaned.localCheckpoint(eager=True)
    # no distinct: exactly one occurrence per (lk, lk2) is kept, so the
    # admitted key set is unique by construction
    kept_lines = (
        occ.filter(F.col("kept"))
        .select(
            "lk",
            "lk2",
            F.pmod(F.col("lk"), F.lit(_LINE_IDX_BUCKETS)).alias("bucket"),
            F.lit(epoch_id).alias("src_epoch"),
        )
        .localCheckpoint(eager=True)
    )
    cleaned.write.mode("overwrite").parquet(f"{out_dir}/docs/epoch={epoch_id}")
    # hash buckets at the FILE grain, not directory grain: repartition by
    # bucket writes one bucket-pure file per bucket per epoch (parquet
    # min/max stats on the bucket column make per-bucket maintenance and
    # scans file-prunable). Directory-grain partitionBy("bucket") was
    # measured and rejected twice: per-input-task slivers cost 2.4×
    # throughput (~2 000 files/epoch), and even one-file-per-dir kept a
    # ~25% per-batch partition-discovery tax at 20 epochs. An epoch too
    # large for one task per bucket would salt the repartition key — the
    # bucket count, not the task layout, is the maintenance unit.
    kept_lines.repartition(
        _LINE_IDX_BUCKETS, "bucket"
    ).sortWithinPartitions("bucket", "lk").write.mode("overwrite").parquet(
        f"{idx_path}/epoch={epoch_id}"
    )


def corpus_lines_stream(
    spark: SparkSession, src_dir: str, out_dir: str, schema=None
):
    """Wire :func:`admit_lines_batch` into a file-source stream (one file
    per trigger, availableNow-drainable — same harness as
    :func:`corpus_ingest_stream`)."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch_id: admit_lines_batch(df, out_dir, epoch_id)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def admit_neardup_batch(batch: DataFrame, out_dir: str, epoch_id: int) -> None:
    """SimHash near-dup admission per micro-batch — the FUZZY sibling of
    :func:`admit_batch`: arriving docs are rejected when their 64-bit
    SimHash lies within Hamming distance 3 of the persisted signature
    index (4×16-bit banded candidates, exact xor+bit_count verify) or of
    an earlier doc in the same batch; survivors' signatures join the
    index. The selection is ``neardup_admit_plan`` — the same function
    the registered batch twin ``corpus_neardup_admit_twin`` runs, so its
    driver row is direct evidence for this path's admit semantics.

    Same exactly-once recipe as the exact gate: the admit is a
    deterministic function of (batch, index-minus-own-epoch) and both
    writes overwrite their own ``epoch=N`` partition, so a replayed
    epoch excludes its own prior signatures (or it would block itself)
    and clobbers its own partial output. At 100 TB the signature index
    is 8 bytes per admitted doc — bucket it on a band key so the
    per-batch candidate join co-locates; fold old epochs with
    :func:`compact_simhash_index` (the shared grace protocol)."""
    from vat_etl_spark.queries.dedup import neardup_admit_plan

    spark = batch.sparkSession
    idx_path = f"{out_dir}/simhash_index"
    existing = None
    if pathlib.Path(idx_path).exists():
        idx = (
            spark.read.option("basePath", idx_path)
            .option("ignoreMissingFiles", "true")
            .option("mergeSchema", "true")
            .parquet(idx_path)
        )
        # replay exclusion on DATA-column provenance, coalesced with the
        # partition epoch — identical rule to admit_batch/admit_lines_batch
        if "src_epoch" in idx.columns:
            prov = F.coalesce(F.col("src_epoch"), F.col("epoch"))
        else:
            prov = F.col("epoch")
        existing = idx.filter(prov != epoch_id).select("simhash").distinct()
    admitted = neardup_admit_plan(batch, existing)
    # stable snapshot: both writes re-execute `admitted`; the index must
    # record exactly the signatures the docs write admitted
    admitted = admitted.localCheckpoint(eager=True)
    admitted.drop("simhash").write.mode("overwrite").parquet(
        f"{out_dir}/docs/epoch={epoch_id}"
    )
    admitted.select(
        "simhash", F.lit(epoch_id).alias("src_epoch")
    ).distinct().write.mode("overwrite").parquet(f"{idx_path}/epoch={epoch_id}")


def bootstrap_simhash_index(
    spark: SparkSession, corpus_out_dir: str, stream_out_dir: str
) -> int:
    """Seed a streaming ingest directory's signature index from a BATCH
    ``build_corpus`` output, so continuous ingest takes over exactly where
    the nightly build left off: the batch corpus's persisted
    ``neardup_sig_index`` lands as partition ``epoch=-1`` (a real epoch id
    can never be negative, so replay exclusion never drops it, and the
    compactor folds it like any other epoch). Returns the signature count.
    This is the handoff that lets the batch funnel and the streaming gate
    share ONE dedup state — a re-sent batch corpus is fully rejected by
    the stream (pinned in tests/test_streaming.py)."""
    sigs = spark.read.parquet(f"{corpus_out_dir}/neardup_sig_index")
    out = (
        sigs.select("simhash", F.lit(-1).alias("src_epoch"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out.write.mode("overwrite").parquet(
        f"{stream_out_dir}/simhash_index/epoch=-1"
    )
    return out.count()


def compact_simhash_index(
    spark: SparkSession, out_dir: str, grace_seconds: float = 300.0
) -> int:
    """Signature-index maintenance twin of :func:`compact_key_index` —
    identical grace/snapshot/publish-then-mark protocol (shared via
    ``_compact_index``) folding on the ``simhash`` column."""
    return _compact_index(spark, f"{out_dir}/simhash_index", "simhash",
                          grace_seconds)


def corpus_neardup_stream(
    spark: SparkSession, src_dir: str, out_dir: str, schema=None
):
    """Wire :func:`admit_neardup_batch` into a file-source stream (one
    file per trigger, availableNow-drainable — same harness as
    :func:`corpus_ingest_stream`)."""
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch_id: admit_neardup_batch(df, out_dir, epoch_id)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
