package graft.lake.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.{DataFileEntry, LakeTable}

/** Offset = a committed snapshot id. Snapshot ids are allocated max+1
  * over the whole log, so offsets are monotonic even across a
  * [[LakeTable.rollbackTo]]. */
private[sql] final case class LakeOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** Structured-Streaming source over a lake table: each micro-batch is
  * the set of data files APPENDED between two snapshot offsets — the
  * incremental-append feed ([[LakeTable.changesSince]]'s shape) under
  * Spark's own checkpointed offset tracking, which is what makes a
  * lake→lake pipeline exactly-once end-to-end (this source replays a
  * batch deterministically from its offset range; the lake sinks
  * dedupe replayed batch ids inside the commit CAS).
  *
  * Batch planning delegates to Spark's vectorized parquet source: the
  * offset range resolves to file paths via the snapshot parent chain
  * (driver-side, O(changed files)), and a per-batch ParquetTable scan
  * plans the actual partitions — the read itself is the same
  * distributed columnar scan the batch path uses, at any batch size.
  *
  * Snapshot semantics (the Iceberg streaming-read contract):
  *  - `append` snapshots stream their added files;
  *  - `replace` (compaction) snapshots are SKIPPED — they rewrite
  *    existing rows, streaming them would duplicate data;
  *  - `delete`/`overwrite` snapshots refuse by default (an append-only
  *    row feed cannot represent row removal or mutation); the
  *    `skip-mutation-snapshots` option skips them instead, for
  *    pipelines that only care about new data.
  *
  * Options: `stream-from` = `latest` (default: only commits after the
  * stream starts) | `beginning`; `stream-from-snapshot` = explicit id;
  * `skip-mutation-snapshots` = true|false.
  */
private[sql] final class LakeMicroBatchStream(
    lt: LakeTable, options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val skipMutations = options.getBoolean("skip-mutation-snapshots", false)

  // captured at planning time (driver): the stream execution thread may
  // not carry an active-session thread-local
  private val session = SparkSession.active

  // planInputPartitions/createReaderFactory run back-to-back on the
  // stream execution thread; the factory is partition-agnostic
  // (FilePartition readers), but building it from the batch keeps
  // schema/options in one place
  @volatile private var lastBatch: org.apache.spark.sql.connector.read.Batch = _

  override def initialOffset(): Offset = {
    val explicit = Option(options.get("stream-from-snapshot")).map(_.toLong)
    explicit.foreach { id =>
      require(lt.refresh().metadata.snapshot(id).isDefined || id == 0L,
        s"stream-from-snapshot $id is not a snapshot of ${lt.name}")
    }
    LakeOffset(explicit.getOrElse {
      options.getOrDefault("stream-from", "latest") match {
        case "beginning" => 0L
        case "latest" => math.max(lt.refresh().currentSnapshotId, 0L)
        case other => throw new IllegalArgumentException(
          s"stream-from must be 'latest' or 'beginning', got '$other'")
      }
    })
  }

  override def latestOffset(): Offset =
    LakeOffset(math.max(lt.refresh().currentSnapshotId, 0L))

  override def deserializeOffset(json: String): Offset = LakeOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Files appended in `(startId, endId]`, oldest snapshot first —
    * walks the parent chain from the end offset, so a rolled-back
    * lineage is never replayed (its snapshots are not ancestors). */
  private def filesBetween(startId: Long, endId: Long): Seq[DataFileEntry] = {
    val m = lt.refresh().metadata
    val out = List.newBuilder[DataFileEntry]
    var cur = m.snapshot(endId)
    if (cur.isEmpty && endId > 0L)
      throw new IllegalStateException(
        s"offset snapshot $endId of ${lt.name} was expired; the stream " +
          "cannot determine what it already read — restart from a fresh checkpoint")
    val acc = scala.collection.mutable.ListBuffer.empty[Seq[DataFileEntry]]
    while (cur.exists(_.id > startId)) {
      val s = cur.get
      val parent = s.parentId.flatMap(m.snapshot)
      if (parent.isEmpty && s.parentId.exists(_ > startId))
        throw new IllegalStateException(
          s"snapshot history of ${lt.name} between offsets $startId and $endId " +
            "was expired; restart from a fresh checkpoint")
      val parentPaths = parent.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
      s.operation match {
        case "append" => acc += s.files.filterNot(f => parentPaths(f.path))
        case "replace" => () // compaction: same rows in new files — not new data
        case op =>
          if (!skipMutations) throw new UnsupportedOperationException(
            s"streaming read of ${lt.name} hit a '$op' snapshot (id ${s.id}): " +
              "an append feed cannot represent row deletion/mutation — set " +
              "option skip-mutation-snapshots=true to stream past it, or " +
              "use changesSince for a reconciling batch read")
      }
      cur = parent
    }
    acc.reverse.foreach(out ++= _)
    out.result()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = filesBetween(
      start.asInstanceOf[LakeOffset].snapshotId,
      end.asInstanceOf[LakeOffset].snapshotId)
    val table = org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      lt.name,
      // ID-based matching, as everywhere: pre-rename files must resolve
      // renamed columns by parquet field ID
      org.apache.spark.sql.graftbridge.SessionBridge.sessionWithConfs(
        session, Map("spark.sql.parquet.fieldId.read.enabled" -> "true")),
      CaseInsensitiveStringMap.empty(),
      files.map(_.path),
      Some(lt.metadata.schemaWithFieldIds),
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
    lastBatch = table.newScanBuilder(CaseInsensitiveStringMap.empty()).build().toBatch
    lastBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    lastBatch.createReaderFactory()
}
