package graft.lake

import java.sql.{Connection, DriverManager, SQLException}

/** Metadata documents behind a JDBC database — the commit mechanism the
  * reference actually deploys (LocalIcebergCatalog.java:133-135,197-199:
  * Iceberg's JdbcCatalog on embedded H2; this engine's twin runs on the
  * Derby embedded driver Spark already ships). The CAS is the database's
  * own primary-key uniqueness: `putIfAbsent` is ONE INSERT, and exactly
  * one of N racing committers avoids the duplicate-key error — the same
  * row-insert serialization point Iceberg's JDBC catalog relies on, with
  * the database's durability (WAL) replacing filesystem atomicity.
  *
  * Layout: `LAKE_DOCS(DOC_KEY PK, CONTENT)` holds every metadata
  * document verbatim (v{N}.json, manifests, version hints — data
  * parquet stays on the warehouse filesystem exactly as with every
  * other backend); `LAKE_DIRS(DIR_KEY PK)` mirrors the directory tree
  * for namespace listings. Prefix queries compare with `SUBSTR`, never
  * `LIKE` — paths may carry LIKE metacharacters.
  *
  * Connections are per-operation on the embedded driver (in-process,
  * no network round trip); every operation auto-commits, so the CAS
  * needs no explicit transaction — the INSERT is atomic by itself.
  * Document keys are bounded (2048 chars) to stay inside Derby's index
  * key limits; warehouse layouts produce paths far shorter. */
final class JdbcCommitBackend(jdbcUrl: String) extends CommitBackend {
  JdbcCommitBackend.quietDerby()

  private def connect(): Connection = DriverManager.getConnection(
    if (jdbcUrl.contains(";create=")) jdbcUrl else jdbcUrl + ";create=true")

  private def withConn[A](f: Connection => A): A = {
    val c = connect()
    try f(c) finally c.close()
  }

  // bootstrap the two tables once per database (races settle on the
  // duplicate-table error — first creator wins, others proceed)
  withConn { c =>
    def createQuietly(ddl: String): Unit =
      try { c.createStatement().executeUpdate(ddl); () }
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
    createQuietly("CREATE TABLE LAKE_DOCS (" +
      "DOC_KEY VARCHAR(2048) NOT NULL PRIMARY KEY, CONTENT CLOB NOT NULL)")
    createQuietly("CREATE TABLE LAKE_DIRS (" +
      "DIR_KEY VARCHAR(2048) NOT NULL PRIMARY KEY)")
  }

  private def key(p: LakePath): String = {
    val k = p.uri.stripSuffix("/")
    require(k.length <= 2048,
      s"metadata path exceeds the JDBC backend's 2048-char key bound: $k")
    k
  }

  def putIfAbsent(path: LakePath, content: String): Boolean = withConn { c =>
    val ps = c.prepareStatement(
      "INSERT INTO LAKE_DOCS (DOC_KEY, CONTENT) VALUES (?, ?)")
    ps.setString(1, key(path)); ps.setString(2, content)
    try { ps.executeUpdate(); true }
    catch { case e: SQLException if e.getSQLState == "23505" => false }
  }

  def putOverwrite(path: LakePath, content: String): Unit = withConn { c =>
    // update-then-insert loop: last writer wins, racing inserts retry
    // as updates — never throws out of a best-effort hint publish
    var done = false
    while (!done) {
      val up = c.prepareStatement(
        "UPDATE LAKE_DOCS SET CONTENT = ? WHERE DOC_KEY = ?")
      up.setString(1, content); up.setString(2, key(path))
      if (up.executeUpdate() > 0) done = true
      else {
        val ins = c.prepareStatement(
          "INSERT INTO LAKE_DOCS (DOC_KEY, CONTENT) VALUES (?, ?)")
        ins.setString(1, key(path)); ins.setString(2, content)
        try { ins.executeUpdate(); done = true }
        catch { case e: SQLException if e.getSQLState == "23505" => () }
      }
    }
  }

  def get(path: LakePath): Option[String] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT CONTENT FROM LAKE_DOCS WHERE DOC_KEY = ?")
    ps.setString(1, key(path))
    val rs = ps.executeQuery()
    if (rs.next()) Some(rs.getString(1)) else None
  }

  def delete(path: LakePath): Unit = withConn { c =>
    val ps = c.prepareStatement("DELETE FROM LAKE_DOCS WHERE DOC_KEY = ?")
    ps.setString(1, key(path))
    ps.executeUpdate()
    ()
  }

  /** Rows whose key starts with `prefix` — SUBSTR compare, LIKE-safe. */
  private def prefixed(c: Connection, table: String, col: String,
      prefix: String): Seq[String] = {
    val ps = c.prepareStatement(
      s"SELECT $col FROM $table WHERE SUBSTR($col, 1, ?) = ?")
    ps.setInt(1, prefix.length); ps.setString(2, prefix)
    val rs = ps.executeQuery()
    val buf = scala.collection.mutable.Buffer.empty[String]
    while (rs.next()) buf += rs.getString(1)
    buf.toSeq
  }

  def listChildren(dir: LakePath): Seq[String] = withConn { c =>
    val prefix = key(dir) + "/"
    (prefixed(c, "LAKE_DOCS", "DOC_KEY", prefix) ++
      prefixed(c, "LAKE_DIRS", "DIR_KEY", prefix))
      .map(_.stripPrefix(prefix).takeWhile(_ != '/')).distinct
  }

  def ensureDir(dir: LakePath): Unit = withConn { c =>
    var u = key(dir)
    var more = true
    while (u.nonEmpty && more) {
      val ps = c.prepareStatement(
        "INSERT INTO LAKE_DIRS (DIR_KEY) VALUES (?)")
      ps.setString(1, u)
      more = try { ps.executeUpdate(); true }
        catch { case e: SQLException if e.getSQLState == "23505" => false }
      val i = u.lastIndexOf('/')
      u = if (i <= 0 || u.substring(0, i).endsWith(":/")) "" else u.substring(0, i)
    }
  }

  def isDir(p: LakePath): Boolean = withConn { c =>
    val k = key(p)
    val ps = c.prepareStatement(
      "SELECT 1 FROM LAKE_DIRS WHERE DIR_KEY = ?")
    ps.setString(1, k)
    ps.executeQuery().next() ||
      prefixed(c, "LAKE_DOCS", "DOC_KEY", k + "/").nonEmpty
  }

  def deleteTree(dir: LakePath): Unit = withConn { c =>
    val k = key(dir)
    Seq("LAKE_DOCS" -> "DOC_KEY", "LAKE_DIRS" -> "DIR_KEY").foreach {
      case (table, col) =>
        val ps = c.prepareStatement(
          s"DELETE FROM $table WHERE $col = ? OR SUBSTR($col, 1, ?) = ?")
        ps.setString(1, k); ps.setInt(2, k.length + 1); ps.setString(3, k + "/")
        ps.executeUpdate()
    }
    ()
  }
}

object JdbcCommitBackend {
  /** Derby writes a derby.log into the working directory by default —
    * route it to a discarding stream once per JVM. */
  @volatile private var quieted = false
  def quietDerby(): Unit = if (!quieted) synchronized {
    if (!quieted) {
      System.setProperty("derby.stream.error.method",
        "graft.lake.JdbcCommitBackend.devNull")
      quieted = true
    }
  }
  /** Referenced by name via derby.stream.error.method. */
  def devNull: java.io.OutputStream =
    java.io.OutputStream.nullOutputStream()
}
