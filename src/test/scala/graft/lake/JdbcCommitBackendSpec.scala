package graft.lake

import org.apache.spark.sql.functions._

/** The JDBC (Derby embedded) commit backend — the reference's own
  * catalog mechanism (JdbcCatalog on an embedded database,
  * LocalIcebergCatalog.java:133-135) twinned: document CAS = row
  * insert, durability = the database, restart = reopen the same JDBC
  * URL. The 8-writer race runs in ConcurrencySpec's parameterized
  * matrix; this spec covers the document contract and the restartable
  * lifecycle the reference's tests exercise
  * (LocalIcebergCatalogTest.java:114-156). */
class JdbcCommitBackendSpec extends LakeSuite {

  private def freshDb(): String =
    "jdbc:derby:" + java.nio.file.Files
      .createTempDirectory("graft_jdbc_").resolve("db")

  test("document contract: CAS, overwrite, listing, dirs, deleteTree") {
    val be = new JdbcCommitBackend(freshDb())
    val root = LakePath("/wh")
    be.ensureDir(root.resolve("ns/t/metadata"))
    assert(be.isDir(root.resolve("ns")))
    assert(!be.isDir(root.resolve("nope")))

    val v1 = root.resolve("ns/t/metadata/v1.json")
    assert(be.putIfAbsent(v1, "one"))
    assert(!be.putIfAbsent(v1, "two"), "the CAS must refuse an existing key")
    assert(be.get(v1).contains("one"))
    be.putOverwrite(root.resolve("ns/t/metadata/version-hint"), "1")
    be.putOverwrite(root.resolve("ns/t/metadata/version-hint"), "2")
    assert(be.get(root.resolve("ns/t/metadata/version-hint")).contains("2"))
    assert(be.listChildren(root.resolve("ns/t/metadata")).toSet
      == Set("v1.json", "version-hint"))
    assert(be.listChildren(root).toSet == Set("ns"))
    // paths with LIKE metacharacters must not confuse prefix queries
    val weird = root.resolve("ns/t%x_y/metadata/v1.json")
    assert(be.putIfAbsent(weird, "w"))
    assert(be.listChildren(root.resolve("ns")).toSet == Set("t", "t%x_y"))
    be.delete(v1)
    assert(be.get(v1).isEmpty)
    be.deleteTree(root.resolve("ns"))
    assert(be.listChildren(root).isEmpty)
  }

  test("catalog lifecycle on JDBC metadata survives a backend restart") {
    val db = freshDb()
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh, new SimpleMetrics, new JdbcCommitBackend(db))
    val t = cat.createTable("ns", "t", ordersDF.schema)
    t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    assert(t.refresh().newScan().toDF(spark).count() == ordersDF.count())

    // "restart": a FRESH backend instance on the same database + the
    // same warehouse — the metadata lives in the DB, the parquet on
    // the warehouse FS, exactly the reference's stop/reopen shape
    val cat2 = LakeCatalog.open(wh, new SimpleMetrics, new JdbcCommitBackend(db))
    val t2 = cat2.loadTable("ns", "t")
    assert(t2.snapshots.size == 2)
    assert(t2.newScan().toDF(spark).count() == ordersDF.count())
    // and the reopened handle commits onward
    t2.deleteWhere(spark, LakePredicate.Ge("o_totalprice", Double.box(400000.0)))
    val survivors = ordersDF.filter(col("o_totalprice") < 400000.0).count()
    assert(cat2.loadTable("ns", "t").newScan().toDF(spark).count() == survivors)
  }
}
