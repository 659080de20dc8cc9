package graft.lake

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL views persisted in the lake catalog — the Iceberg view-spec
  * analog over this engine's JSON-document metadata layer. A view is a
  * named, versioned SQL definition: each CREATE OR REPLACE appends an
  * immutable [[ViewVersion]] to the log (Iceberg: `versions` +
  * `version-log` in view metadata), so the full definition history
  * survives and is auditable. Storage mirrors tables —
  * `<warehouse>/<ns>/<view>/view-metadata/v{N}.json` committed through
  * the same putIfAbsent CAS — so racing writers serialize exactly like
  * table commits and a catalog reopen sees views durably.
  *
  * The resolution CONTEXT (catalog + namespace current at definition
  * time) rides in each version: unqualified table names inside the SQL
  * must resolve where the AUTHOR meant them, not wherever the reader's
  * session happens to point (the same capture Spark's session-catalog
  * views and Iceberg's view representations perform).
  */
final case class ViewVersion(
    versionId: Int,
    timestampMs: Long,
    sql: String,
    schema: StructType,
    currentCatalog: String,
    currentNamespace: Seq[String],
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[String])

final case class ViewDoc(
    name: String,
    currentVersionId: Int,
    versions: Seq[ViewVersion],
    properties: Map[String, String]) {
  def current: ViewVersion = versions.find(_.versionId == currentVersionId)
    .getOrElse(throw new IllegalStateException(
      s"view $name: currentVersionId $currentVersionId missing from version log"))
}

object ViewJson {
  private val mapper = new ObjectMapper()

  private def q(s: String): String = mapper.writeValueAsString(s)

  private def arr(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")

  def write(d: ViewDoc): String =
    s"""{"formatVersion":1,"name":${q(d.name)},""" +
      s""""currentVersionId":${d.currentVersionId},""" +
      s""""properties":${d.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")},""" +
      s""""versions":${d.versions.map(versionJson).mkString("[", ",", "]")}}"""

  private def versionJson(v: ViewVersion): String =
    s"""{"versionId":${v.versionId},"timestampMs":${v.timestampMs},""" +
      s""""sql":${q(v.sql)},"schema":${v.schema.json},""" +
      s""""currentCatalog":${q(v.currentCatalog)},""" +
      s""""currentNamespace":${arr(v.currentNamespace)},""" +
      s""""queryColumnNames":${arr(v.queryColumnNames)},""" +
      s""""columnAliases":${arr(v.columnAliases)},""" +
      s""""columnComments":${arr(v.columnComments)}}"""

  def parse(json: String): ViewDoc = {
    val n = mapper.readTree(json)
    def strs(node: JsonNode): Seq[String] =
      node.elements().asScala.map(_.asText).toSeq
    ViewDoc(
      name = n.get("name").asText,
      currentVersionId = n.get("currentVersionId").asInt,
      properties = Option(n.get("properties")).map(p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      versions = n.get("versions").elements().asScala.map { v =>
        ViewVersion(
          versionId = v.get("versionId").asInt,
          timestampMs = v.get("timestampMs").asLong,
          sql = v.get("sql").asText,
          schema = DataType.fromJson(mapper.writeValueAsString(v.get("schema")))
            .asInstanceOf[StructType],
          currentCatalog = v.get("currentCatalog").asText,
          currentNamespace = strs(v.get("currentNamespace")),
          queryColumnNames = strs(v.get("queryColumnNames")),
          columnAliases = strs(v.get("columnAliases")),
          columnComments = strs(v.get("columnComments")))
      }.toSeq)
  }
}
