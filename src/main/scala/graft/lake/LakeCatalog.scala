package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types.StructType

/** Directory-backed catalog: `<warehouse>/<namespace>/<table>/{metadata,data}`.
  *
  * The Spark-native analog of the reference's LocalIcebergCatalog
  * (reference: JdbcCatalog on embedded H2 + MinIO warehouse,
  * LocalIcebergCatalog.java:99-142): here the metadata directory IS the
  * durable state, so start/stop/reopen (LocalIcebergCatalogTest.java:114-156)
  * reduce to `open(dir)` being idempotent. The H2 compare-and-swap role in
  * commits (LocalIcebergCatalog.java:197-199) is played by an atomic
  * create-if-absent rename of `metadata/v{N}.json` — a real CAS on a local
  * or HDFS filesystem; an object store would need a conditional-put
  * backend exactly as the reference needed H2 (SURVEY.md §7.4).
  */
final class LakeCatalog private (val warehouse: Path, val reporter: MetricsReporter) {

  def createNamespace(ns: String): Unit =
    Files.createDirectories(warehouse.resolve(ns))

  def listNamespaces(): Seq[String] =
    if (!Files.isDirectory(warehouse)) Nil
    else LakeCatalog.listDir(warehouse)
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).sorted

  def listTables(ns: String): Seq[String] = {
    val d = warehouse.resolve(ns)
    if (!Files.isDirectory(d)) Nil
    else LakeCatalog.listDir(d)
      .filter(p => Files.isDirectory(p.resolve("metadata")))
      .map(_.getFileName.toString).sorted
  }

  def tableExists(ns: String, name: String): Boolean =
    LakeCatalog.currentVersion(metadataDir(ns, name)).isDefined

  private def tableDir(ns: String, name: String): Path = warehouse.resolve(ns).resolve(name)
  private def metadataDir(ns: String, name: String): Path = tableDir(ns, name).resolve("metadata")

  /** A5: create table with schema + spec, no snapshot yet (empty log). */
  def createTable(ns: String, name: String, schema: StructType,
      spec: Seq[PartitionField] = Nil): LakeTable = {
    val md = metadataDir(ns, name)
    if (tableExists(ns, name))
      throw new IllegalArgumentException(s"table $ns.$name already exists")
    Files.createDirectories(md)
    val meta = TableMetadata(s"$ns.$name", tableDir(ns, name).toString, schema, spec,
      snapshots = Nil, currentSnapshotId = -1L)
    val v1 = md.resolve("v1.json")
    val tmp = Files.createTempFile(md, ".tmp-", ".json")
    Files.writeString(tmp, MetadataJson.write(meta))
    try Files.createLink(v1, tmp) // CAS like commit(): racing creators
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalArgumentException(s"table $ns.$name already exists")
    }
    Files.deleteIfExists(tmp)
    writeHint(md, 1)
    new LakeTable(this, ns, name, meta, 1)
  }

  /** A6: load table; schema round-trips identically (StructType equality). */
  def loadTable(ns: String, name: String): LakeTable = {
    val md = metadataDir(ns, name)
    val v = LakeCatalog.currentVersion(md).getOrElse(
      throw new NoSuchElementException(s"no such table $ns.$name under $warehouse"))
    new LakeTable(this, ns, name, readMeta(md, v), v)
  }

  def dropTable(ns: String, name: String): Unit = {
    val d = tableDir(ns, name)
    if (Files.isDirectory(d)) {
      val stream = Files.walk(d)
      val all = try stream.iterator.asScala.toSeq finally stream.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  private[lake] def readMeta(md: Path, version: Int): TableMetadata =
    MetadataJson.read(Files.readString(md.resolve(s"v$version.json")))

  private def writeHint(md: Path, v: Int): Unit = {
    val tmp = Files.createTempFile(md, ".hint-", ".txt")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, md.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Optimistic CAS commit: re-read latest, re-apply, attempt
    * create-if-absent of the next version file; on collision retry.
    * `attempts` counts the first try as 1 (Iceberg semantics,
    * reference: IntegrationTest.java:107). Returns (newMeta, version,
    * attempts). */
  private[lake] def commit(ns: String, name: String, maxRetries: Int = 10)(
      transform: TableMetadata => TableMetadata): (TableMetadata, Int, Int) = {
    val md = metadataDir(ns, name)
    var attempts = 0
    while (attempts < maxRetries) {
      attempts += 1
      val base = LakeCatalog.currentVersion(md).getOrElse(
        throw new IllegalStateException(s"table $ns.$name has no metadata"))
      val next = transform(readMeta(md, base))
      val target = md.resolve(s"v${base + 1}.json")
      val tmp = Files.createTempFile(md, ".tmp-", ".json")
      Files.writeString(tmp, MetadataJson.write(next))
      try {
        // createLink is the real CAS: atomically fails if v{N+1} exists.
        // (Files.move+ATOMIC_MOVE is a plain rename(2) on POSIX and
        // silently REPLACES an existing target — caught by LakeCatalogSpec.)
        Files.createLink(target, tmp)
        Files.deleteIfExists(tmp)
        writeHint(md, base + 1)
        return (next, base + 1, attempts)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race; go around
      }
    }
    throw new IllegalStateException(
      s"commit to $ns.$name failed after $maxRetries attempts")
  }
}

object LakeCatalog {
  /** Files.list with the stream closed (leaked DirectoryStreams exhaust
    * fds on the hot commit path — currentVersion runs every attempt). */
  private[lake] def listDir(p: Path): Seq[Path] = {
    val stream = Files.list(p)
    try stream.iterator.asScala.toSeq finally stream.close()
  }

  /** A1-A3: idempotent open; an existing warehouse dir reopens with all
    * state intact (the restart-durability contract). */
  def open(dir: String, reporter: MetricsReporter = MetricsReporter.noop): LakeCatalog = {
    val p = Paths.get(dir)
    Files.createDirectories(p) // A4: "bucket" bootstrap
    new LakeCatalog(p, reporter)
  }

  /** Current metadata version: trust version-hint if present and valid,
    * else fall back to listing v*.json (hint is best-effort, like the
    * reference's version-hint file convention). */
  private[lake] def currentVersion(md: Path): Option[Int] = {
    if (!Files.isDirectory(md)) return None
    val hint = md.resolve("version-hint.text")
    val hinted =
      if (Files.exists(hint))
        scala.util.Try(Files.readString(hint).trim.toInt)
          .toOption.filter(v => Files.exists(md.resolve(s"v$v.json")))
      else None
    val listed = listDir(md)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        scala.util.Try(s.stripPrefix("v").stripSuffix(".json").toInt).toOption }
      .flatten.maxOption
    (hinted, listed) match {
      case (Some(h), Some(l)) => Some(math.max(h, l))
      case (h, l) => h.orElse(l)
    }
  }
}
