package graft.lake

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-process Hadoop FileSystem with OBJECT-STORE semantics — the
  * storage model MinIO gives the reference (S3FileIO + testcontainers,
  * LocalIcebergCatalog.java:104-131), available without containers:
  *
  *  - a FLAT key→bytes map; "directories" are synthesized from key
  *    prefixes (plus explicit markers for empty ones), like S3 prefixes;
  *  - writes become visible ATOMICALLY AT CLOSE (an S3 PUT) — a reader
  *    never observes a growing stream;
  *  - rename is COPY+DELETE, per key, and silently REPLACES an existing
  *    destination — there is NO atomic rename and NO create-exclusive
  *    rename to lean on, exactly the semantics that make a naive
  *    rename-based commit protocol lose updates.
  *
  * Registered under `mem://` via the test core-site.xml, so
  * `LakeCatalog.open("mem://wh")` routes metadata documents through
  * [[HadoopFsCommitBackend]] and Spark parquet I/O through this store —
  * proving the write-then-publish CAS and the whole table lifecycle
  * against object-store behavior (ConcurrencySpec, LakeCatalogSpec).
  * Durability scope = process lifetime, like the reference's embedded
  * H2 + MinIO test deployment. */
class MemFileSystem extends FileSystem {
  import MemFileSystem._

  private var fsUri: URI = _
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    setConf(conf)
  }

  override def getScheme: String = "mem"
  override def getUri: URI = fsUri

  private def key(p: Path): String =
    p.makeQualified(fsUri, wd).toUri.toString.stripSuffix("/")

  private def isDirKey(k: String): Boolean = {
    val prefix = k + "/"
    dirs.contains(k) ||
      files.keySet.stream.anyMatch(_.startsWith(prefix)) ||
      dirs.stream.anyMatch((d: String) => d.startsWith(prefix))
  }

  private def fileStatus(p: Path, k: String): FileStatus = {
    val f = files.get(k)
    if (f != null)
      new FileStatus(f.bytes.length.toLong, false, 1, 4 * 1024 * 1024L, f.mtimeMs, p)
    else if (isDirKey(k))
      new FileStatus(0L, true, 1, 0L, 0L, p)
    else throw new FileNotFoundException(k)
  }

  override def getFileStatus(p: Path): FileStatus = fileStatus(p, key(p))

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val f = files.get(key(p))
    if (f == null) throw new FileNotFoundException(key(p))
    new FSDataInputStream(new SeekableBytes(f.bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (!overwrite && files.containsKey(k))
      throw new FileAlreadyExistsException(k)
    val buf = new ByteArrayOutputStream()
    // the PUT: bytes land in one atomic map update at close — before
    // that, the key does not exist at all
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit =
        files.put(k, Blob(buf.toByteArray, System.currentTimeMillis()))
    }, null)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new IOException("mem:// does not support append")

  /** Object-store rename: per-key copy+delete, destination silently
    * replaced — never atomic, never a CAS. Hadoop directory semantics
    * kept (rename into an existing dir lands under src's name) so
    * Spark's output committer works. */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val dstDirTarget =
      if (isDirKey(key(dst))) key(dst) + "/" + src.getName else key(dst)
    if (files.containsKey(sk)) {
      val blob = files.get(sk)
      files.put(dstDirTarget, blob)
      files.remove(sk)
      true
    } else if (isDirKey(sk)) {
      val prefix = sk + "/"
      val keys = files.keySet.stream.filter(_.startsWith(prefix))
        .toArray.toSeq.map(_.toString)
      keys.foreach { k =>
        files.put(dstDirTarget + "/" + k.stripPrefix(prefix), files.get(k))
        files.remove(k)
      }
      val markers = dirs.stream.filter((d: String) => d == sk || d.startsWith(prefix))
        .toArray.toSeq.map(_.toString)
      markers.foreach { d =>
        dirs.add(
          if (d == sk) dstDirTarget else dstDirTarget + "/" + d.stripPrefix(prefix))
        dirs.remove(d)
      }
      true
    } else false
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = key(p)
    if (files.containsKey(k)) { files.remove(k); true }
    else if (isDirKey(k)) {
      val prefix = k + "/"
      val childFiles = files.keySet.stream.filter(_.startsWith(prefix))
        .toArray.toSeq.map(_.toString)
      val childDirs = dirs.stream.filter((d: String) => d.startsWith(prefix))
        .toArray.toSeq.map(_.toString)
      if (!recursive && (childFiles.nonEmpty || childDirs.nonEmpty))
        throw new IOException(s"$k is a non-empty directory")
      childFiles.foreach(files.remove)
      childDirs.foreach(dirs.remove)
      dirs.remove(k)
      true
    } else false
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    if (files.containsKey(k)) Array(fileStatus(p, k))
    else if (isDirKey(k)) {
      val prefix = k + "/"
      val names = scala.collection.mutable.SortedSet.empty[String]
      files.keySet.forEach { fk =>
        if (fk.startsWith(prefix))
          names += fk.stripPrefix(prefix).takeWhile(_ != '/')
      }
      dirs.forEach { d =>
        if (d.startsWith(prefix))
          names += d.stripPrefix(prefix).takeWhile(_ != '/')
      }
      // a concurrently renamed/deleted key may vanish between the
      // enumeration and the stat — an object-store listing is exactly
      // this kind of non-snapshot; skip the vanished, don't throw
      names.toArray.flatMap { n =>
        try Some(fileStatus(new Path(p, n), prefix + n))
        catch { case _: FileNotFoundException => None }
      }
    } else throw new FileNotFoundException(k)
  }

  override def setWorkingDirectory(dir: Path): Unit = wd = dir
  override def getWorkingDirectory: Path = wd

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    var cur = p
    while (cur != null && cur.toUri.getPath.nonEmpty) {
      dirs.add(key(cur))
      cur = cur.getParent
    }
    true
  }
}

object MemFileSystem {
  private final case class Blob(bytes: Array[Byte], mtimeMs: Long)

  // JVM-shared store: every MemFileSystem instance (one per authority in
  // Hadoop's FS cache) sees the same objects, like one MinIO server
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, Blob]()
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Byte-array input with the seek/pread surface parquet needs. */
  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.InputStream with Seekable with PositionedReadable {
    private var pos = 0

    override def read(): Int =
      if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (pos >= bytes.length) -1
      else {
        val n = math.min(len, bytes.length - pos)
        System.arraycopy(bytes, pos, b, off, n)
        pos += n
        n
      }

    override def available(): Int = bytes.length - pos

    override def seek(p: Long): Unit = {
      if (p > bytes.length) throw new java.io.EOFException(s"seek $p > ${bytes.length}")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int =
      if (position >= bytes.length) -1
      else {
        val n = math.min(length, bytes.length - position.toInt)
        System.arraycopy(bytes, position.toInt, buffer, offset, n)
        n
      }

    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (position + length > bytes.length) throw new java.io.EOFException()
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }

    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
