package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Durable-metadata I/O with one atomic primitive: `putIfAbsent`, a
  * conditional create that fails when the key exists. This is the whole
  * serialization point of the optimistic commit protocol — the role H2's
  * JDBC transaction plays for the reference's catalog
  * (LocalIcebergCatalog.java:197-199: embedded H2 as the commit CAS).
  * Everything else (reads, listings, the best-effort version hint) needs
  * no atomicity.
  *
  * Data files are NOT behind this trait: Spark reads/writes parquet
  * through real filesystem paths regardless; only the metadata documents
  * (v{N}.json, version-hint) route here. An object-store deployment
  * implements putIfAbsent with a conditional PUT (If-None-Match) —
  * [[InMemoryCommitBackend]] proves the protocol against exactly those
  * semantics, with no hard links or atomic renames available.
  */
trait CommitBackend {
  /** Atomically create `path` with `content` iff absent: the CAS. */
  def putIfAbsent(path: Path, content: String): Boolean

  /** Last-writer-wins overwrite (the best-effort version hint). */
  def putOverwrite(path: Path, content: String): Unit

  def get(path: Path): Option[String]

  /** Remove a single document if present (manifest cleanup). */
  def delete(path: Path): Unit

  /** Immediate child names of a directory/prefix (empty if none). */
  def listChildren(dir: Path): Seq[String]

  def ensureDir(dir: Path): Unit

  /** Is `p` a directory/prefix (not a document)? Namespace listings
    * filter on this so stray files in the warehouse root are never
    * reported as namespaces. */
  def isDir(p: Path): Boolean

  /** Recursively remove everything under `dir`, including `dir`. */
  def deleteTree(dir: Path): Unit
}

/** POSIX-filesystem backend. The CAS is `Files.createLink` — a true
  * atomic create-if-absent (rename(2) via ATOMIC_MOVE silently REPLACES
  * an existing target on POSIX, so it is NOT a CAS; caught by
  * LakeCatalogSpec in round 1). Also correct on HDFS-style stores via
  * their create-exclusive flag. */
final class LocalFsCommitBackend extends CommitBackend {
  def putIfAbsent(path: Path, content: String): Boolean = {
    val tmp = Files.createTempFile(path.getParent, ".tmp-", ".json")
    Files.writeString(tmp, content)
    try { Files.createLink(path, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def putOverwrite(path: Path, content: String): Unit = {
    val tmp = Files.createTempFile(path.getParent, ".hint-", ".txt")
    Files.writeString(tmp, content)
    Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def get(path: Path): Option[String] =
    if (Files.exists(path)) Some(Files.readString(path)) else None

  def delete(path: Path): Unit = { Files.deleteIfExists(path); () }

  def listChildren(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val stream = Files.list(dir)
      try stream.iterator.asScala.map(_.getFileName.toString).toSeq
      finally stream.close()
    }

  def ensureDir(dir: Path): Unit = Files.createDirectories(dir)

  def isDir(p: Path): Boolean = Files.isDirectory(p)

  def deleteTree(dir: Path): Unit =
    if (Files.isDirectory(dir)) {
      val stream = Files.walk(dir)
      val all = try stream.iterator.asScala.toSeq finally stream.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
}

/** Metadata documents behind the Hadoop FileSystem API — the API
  * surface an `s3a://`/`hdfs://`/`abfs://` store exposes, mirroring
  * the reference's S3FileIO-first design (LocalIcebergCatalog.java:121-127:
  * MinIO + S3FileIO is its ONLY storage path). SCOPE: what this proves
  * end-to-end is the commit protocol over FileSystem-API semantics
  * (create/rename/list/delete, no hard links); the catalog's warehouse
  * plumbing is java.nio-path based, so URI-scheme warehouses
  * additionally need a URI-addressed catalog layer (out of scope in
  * this sandbox — no object store to run against; the reference leans
  * on testcontainers+MinIO for the same reason).
  *
  * The conditional put is WRITE-THEN-PUBLISH: the complete document goes
  * to a uniquely named temp key first, then an atomic `rename` onto the
  * target — a reader can never observe a half-written document (a
  * create(target, overwrite=false) + write draft published the NAME
  * before the BYTES on stream-visible filesystems, and a racing
  * `readMeta` parsed the partial JSON; caught by ConcurrencySpec).
  * Rename refuses an existing destination on HDFS, making it the CAS
  * there; `RawLocalFileSystem` rename overwrites, so a JVM-local guard
  * serializes the exists-check + rename for file:// tests — a
  * cross-process local-FS deployment should use [[LocalFsCommitBackend]]
  * whose hard-link CAS is kernel-atomic. A true object store implements
  * this trait's contract with a conditional PUT (If-None-Match), where
  * the object appears atomically at close and no rename is needed.
  *
  * The scheme comes from the warehouse path itself; everything else
  * (listing, reads, recursive delete) is plain FileSystem API. */
final class HadoopFsCommitBackend(
    hadoopConf: org.apache.hadoop.conf.Configuration =
      new org.apache.hadoop.conf.Configuration())
    extends CommitBackend {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def hp(p: Path): HPath = new HPath(p.toString)
  private def fsOf(p: HPath): FileSystem = p.getFileSystem(hadoopConf)
  // JVM-GLOBAL serialization for FS implementations whose rename does not
  // refuse an existing destination (RawLocalFileSystem). A per-instance
  // lock failed to serialize two backends opened on the same file://
  // warehouse (two LakeCatalog.open calls, or the per-call backend in
  // the streaming sink-id mint) — both racers passed the exists-check
  // and renamed, losing a commit. Striped by target path so unrelated
  // commits (different tables/warehouses) never serialize on each other.
  private def guardFor(target: HPath): Object =
    HadoopFsCommitBackend.guards(
      math.floorMod(target.toString.hashCode, HadoopFsCommitBackend.guards.length))

  private def writeTemp(fs: FileSystem, dir: HPath, content: String): HPath = {
    val tmp = new HPath(dir, s".tmp-${java.util.UUID.randomUUID}.json")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    tmp
  }

  def putIfAbsent(path: Path, content: String): Boolean = {
    val target = hp(path)
    guardFor(target).synchronized {
    val fs = fsOf(target)
    if (fs.exists(target)) false
    else {
      val tmp = writeTemp(fs, target.getParent, content)
      val won = try fs.rename(tmp, target) catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
      if (!won) fs.delete(tmp, false)
      won
    }
    }
  }

  /** Write-then-publish as well: manifest documents route through here
    * (their names are unique so nothing overwrites in practice, but a
    * reader must still never see partial bytes). An existing destination
    * (the version hint) is deleted first — HDFS rename refuses to
    * replace — leaving a benign not-found window for a best-effort doc. */
  def putOverwrite(path: Path, content: String): Unit = {
    val target = hp(path)
    guardFor(target).synchronized {
    val fs = fsOf(target)
    val tmp = writeTemp(fs, target.getParent, content)
    if (fs.exists(target)) fs.delete(target, false)
    val ok = try fs.rename(tmp, target) catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }
    if (!ok) fs.delete(tmp, false) // racing recreate won; don't leak the temp
    ()
    }
  }

  def get(path: Path): Option[String] = {
    val target = hp(path)
    val fs = fsOf(target)
    if (!fs.exists(target)) None
    else {
      val in = fs.open(target)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  def delete(path: Path): Unit = { fsOf(hp(path)).delete(hp(path), false); () }

  def listChildren(dir: Path): Seq[String] = {
    val d = hp(dir)
    val fs = fsOf(d)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
  }

  def ensureDir(dir: Path): Unit = { fsOf(hp(dir)).mkdirs(hp(dir)); () }

  def isDir(p: Path): Boolean = {
    val h = hp(p)
    val fs = fsOf(h)
    fs.exists(h) && fs.getFileStatus(h).isDirectory
  }

  def deleteTree(dir: Path): Unit = { fsOf(hp(dir)).delete(hp(dir), true); () }
}

object HadoopFsCommitBackend {
  /** 64 JVM-wide lock stripes keyed by target-path hash: every backend
    * instance targeting the same document synchronizes on the same
    * monitor, whichever catalog or streaming sink constructed it. */
  private[lake] val guards: Array[Object] = Array.fill(64)(new Object)
}

/** Conditional-put backend over an in-process map: proves the commit
  * protocol works where hard links and atomic renames do not exist —
  * `putIfAbsent` is the only atomic operation, exactly the contract of
  * an object store's If-None-Match PUT (or the reference's H2 row
  * insert). Durability scope = process lifetime, like the reference's
  * embedded H2 for a test catalog. */
final class InMemoryCommitBackend extends CommitBackend {
  private val docs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def key(p: Path): String = p.toAbsolutePath.normalize.toString

  def putIfAbsent(path: Path, content: String): Boolean =
    docs.putIfAbsent(key(path), content) == null

  def putOverwrite(path: Path, content: String): Unit = { docs.put(key(path), content); () }

  def get(path: Path): Option[String] = Option(docs.get(key(path)))

  def delete(path: Path): Unit = { docs.remove(key(path)); () }

  def listChildren(dir: Path): Seq[String] = {
    val prefix = key(dir) + "/"
    (docs.keySet.asScala ++ dirs.asScala)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).takeWhile(_ != '/'))
      .toSeq.distinct
  }

  def ensureDir(dir: Path): Unit = {
    var p = dir.toAbsolutePath.normalize
    while (p != null && dirs.add(p.toString)) p = p.getParent
  }

  def isDir(p: Path): Boolean = {
    val k = key(p)
    dirs.contains(k) || docs.keySet.asScala.exists(_.startsWith(k + "/"))
  }

  def deleteTree(dir: Path): Unit = {
    val prefix = key(dir) + "/"
    docs.keySet.asScala.filter(_.startsWith(prefix)).foreach(docs.remove)
    dirs.asScala.filter(d => d == key(dir) || d.startsWith(prefix)).foreach(dirs.remove)
  }
}
