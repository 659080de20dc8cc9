package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Table-format model: data-file manifest entries, snapshots, partition
  * spec, and the versioned metadata document — the Spark-native analogs
  * of the reference's Iceberg DataFile/Snapshot/TableMetadata
  * (reference: DataFiles.builder usage IntegrationTest.java:97, snapshot
  * accumulation :92-99, spec plumbing :66,84).
  *
  * Metadata is one JSON document per version (`metadata/v{N}.json`),
  * holding schema + spec + the full snapshot log, each snapshot carrying
  * its complete live-file manifest — which makes time travel a pure
  * lookup. JSON is hand-serialized (deterministic, no reflection) and
  * parsed with Jackson's tree API.
  */
/** A copy-on-write commit lost its race: the files it rewrote were
  * removed by a concurrent commit between read and CAS. Retrying the
  * metadata transform would duplicate/resurrect rows, so the operation
  * itself must be re-run against fresh metadata (Iceberg's
  * validateNoConflictingData behavior). */
final class CommitConflictException(msg: String) extends IllegalStateException(msg)

final case class PartitionField(source: String, transform: String) {
  def render: String = if (transform == "identity") source else s"$transform($source)"

  /** Spark Column computing this field's transform value for a row, in
    * the transform's NATIVE type — cast-to-string here would make range
    * clustering of numeric identity partitions lexicographic ("10000" <
    * "2"), destroying file locality (caught by MergeSpec). Callers that
    * compare against canonical string values cast at the use site. */
  def toColumn: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.{functions => F}
    val c = F.col(source)
    transform match {
      case "identity" => c
      case "year" => F.year(c)
      case "month" => F.date_format(c, "yyyy-MM")
      case "day" => F.to_date(c)
      case "hour" => F.date_format(c, "yyyy-MM-dd'T'HH")
      case tr if tr.startsWith("truncate[") =>
        F.substring(c, 1, tr.stripPrefix("truncate[").stripSuffix("]").toInt)
      case tr if tr.startsWith("bucket[") =>
        F.pmod(F.hash(c), F.lit(tr.stripPrefix("bucket[").stripSuffix("]").toInt))
      case _ => c
    }
  }
}

/** Per-file manifest entry with footer-harvested column stats.
  * Stat values are canonical strings keyed by column name: numerics in
  * decimal, timestamps as micros-since-epoch longs, strings verbatim. */
final case class DataFileEntry(
    path: String,
    recordCount: Long,
    sizeBytes: Long,
    minValues: Map[String, String],
    maxValues: Map[String, String],
    nullCounts: Map[String, Long],
    partitionValues: Map[String, String])

final case class Snapshot(
    id: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | replace | delete | overwrite
    files: Seq[DataFileEntry], // complete live manifest at this snapshot
    summary: Map[String, String]) {
  def totalRecords: Long = files.map(_.recordCount).sum
  def totalSizeBytes: Long = files.map(_.sizeBytes).sum
}

final case class TableMetadata(
    name: String,
    location: String,
    schema: StructType,
    spec: Seq[PartitionField],
    snapshots: Seq[Snapshot],
    currentSnapshotId: Long,
    // Field-ID addressing (reference: schemas declare explicit field IDs,
    // IntegrationTest.java:59-64). IDs are stable across renames and
    // never reused after drops; they live here — NOT in StructField
    // metadata — so table.schema round-trips the user's StructType
    // identically (the reference's schema-identity contract). Write and
    // read paths inject them as parquet field IDs ("parquet.field.id"),
    // which is what makes renamed columns resolve in old files.
    fieldIds: Map[String, Int] = Map.empty,
    lastAssignedFieldId: Int = 0) {
  def currentSnapshot: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.id == id)
  def currentFiles: Seq[DataFileEntry] = currentSnapshot.map(_.files).getOrElse(Nil)

  /** Metadata written before field IDs existed (or built ad hoc) gets
    * positional IDs 1..n — the same assignment createTable performs.
    * Guarded on lastAssignedFieldId too: a table whose columns were ALL
    * dropped has empty fieldIds but a real high-water mark, and
    * resetting it would let addColumn reuse a retired ID — resurrecting
    * the dropped column's bytes from old files. */
  def withFieldIdDefaults: TableMetadata =
    if (fieldIds.nonEmpty || lastAssignedFieldId > 0) this
    else copy(
      fieldIds = schema.fieldNames.zipWithIndex.map { case (n, i) => (n, i + 1) }.toMap,
      lastAssignedFieldId = schema.size)

  /** The schema with parquet field-ID metadata injected per field — the
    * form handed to Spark's parquet reader/writer, never to users. */
  def schemaWithFieldIds: StructType = StructType(schema.fields.map { f =>
    fieldIds.get(f.name) match {
      case Some(id) => f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong("parquet.field.id", id.toLong).build())
      case None => f
    }
  })
}

object MetadataJson {
  private val mapper = new ObjectMapper()

  private def q(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def strMap(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")

  private def longMap(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")

  private def fileJson(f: DataFileEntry): String =
    s"""{"path":${q(f.path)},"recordCount":${f.recordCount},"sizeBytes":${f.sizeBytes},""" +
      s""""minValues":${strMap(f.minValues)},"maxValues":${strMap(f.maxValues)},""" +
      s""""nullCounts":${longMap(f.nullCounts)},"partitionValues":${strMap(f.partitionValues)}}"""

  private def snapshotJson(s: Snapshot): String =
    s"""{"id":${s.id},"parentId":${s.parentId.map(_.toString).getOrElse("null")},""" +
      s""""timestampMs":${s.timestampMs},"operation":${q(s.operation)},""" +
      s""""files":${s.files.map(fileJson).mkString("[", ",", "]")},""" +
      s""""summary":${strMap(s.summary)}}"""

  def write(m: TableMetadata): String =
    s"""{"formatVersion":1,"name":${q(m.name)},"location":${q(m.location)},""" +
      s""""schema":${m.schema.json},""" +
      s""""fieldIds":${m.fieldIds.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")},""" +
      s""""lastAssignedFieldId":${m.lastAssignedFieldId},""" +
      s""""spec":${m.spec.map(p => s"""{"source":${q(p.source)},"transform":${q(p.transform)}}""").mkString("[", ",", "]")},""" +
      s""""snapshots":${m.snapshots.map(snapshotJson).mkString("[", ",", "]")},""" +
      s""""currentSnapshotId":${m.currentSnapshotId}}"""

  private def asStrMap(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  private def asLongMap(n: JsonNode): Map[String, Long] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap

  private def parseFile(n: JsonNode): DataFileEntry = DataFileEntry(
    path = n.get("path").asText(),
    recordCount = n.get("recordCount").asLong(),
    sizeBytes = n.get("sizeBytes").asLong(),
    minValues = asStrMap(n.get("minValues")),
    maxValues = asStrMap(n.get("maxValues")),
    nullCounts = asLongMap(n.get("nullCounts")),
    partitionValues = asStrMap(n.get("partitionValues")))

  private def parseSnapshot(n: JsonNode): Snapshot = Snapshot(
    id = n.get("id").asLong(),
    parentId = if (n.get("parentId").isNull) None else Some(n.get("parentId").asLong()),
    timestampMs = n.get("timestampMs").asLong(),
    operation = n.get("operation").asText(),
    files = n.get("files").elements().asScala.map(parseFile).toSeq,
    summary = asStrMap(n.get("summary")))

  def read(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    TableMetadata(
      name = n.get("name").asText(),
      location = n.get("location").asText(),
      schema = DataType.fromJson(mapper.writeValueAsString(n.get("schema"))).asInstanceOf[StructType],
      spec = n.get("spec").elements().asScala
        .map(p => PartitionField(p.get("source").asText(), p.get("transform").asText())).toSeq,
      snapshots = n.get("snapshots").elements().asScala.map(parseSnapshot).toSeq,
      currentSnapshotId = n.get("currentSnapshotId").asLong(),
      fieldIds = Option(n.get("fieldIds"))
        .map(m => m.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap)
        .getOrElse(Map.empty),
      lastAssignedFieldId = Option(n.get("lastAssignedFieldId")).map(_.asInt()).getOrElse(0)
    ).withFieldIdDefaults // pre-field-ID documents get positional IDs
  }
}
