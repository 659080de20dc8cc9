package graft.lake

import org.apache.spark.sql.functions._
import graft.functions.{ZOrder, ZOrderFunctions}

/** Z-order clustering-on-write: sorting writes by the interleaved
  * Morton code of k columns makes every file's min/max stats tight in
  * ALL k dimensions, so predicates on ANY ordered column prune files —
  * where a linear order only ever serves its leading column. */
class ZOrderSpec extends LakeSuite {

  private def cmpU(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b)

  test("dimension encodings preserve order as unsigned 64-bit words") {
    val longs = Seq(Long.MinValue, -100000L, -1L, 0L, 1L, 42L, Long.MaxValue)
    longs.sliding(2).foreach { case Seq(a, b) =>
      assert(cmpU(ZOrder.encodeLong(a), ZOrder.encodeLong(b)) < 0, s"$a vs $b")
    }
    val doubles = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 1.5, 1e300, Double.PositiveInfinity)
    doubles.sliding(2).foreach { case Seq(a, b) =>
      assert(cmpU(ZOrder.encodeDouble(a), ZOrder.encodeDouble(b)) <= 0, s"$a vs $b")
    }
    assert(cmpU(ZOrder.encodeDouble(-0.0), ZOrder.encodeDouble(0.0)) < 0)
    val strings = Seq("", "a", "ab", "b", "ba", "zz", "ÿ")
    def enc(s: String) = ZOrder.encodeUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    strings.sliding(2).foreach { case Seq(a, b) =>
      assert(cmpU(enc(a), enc(b)) < 0, s"'$a' vs '$b'")
    }
  }

  test("range normalization is monotone, clamps, and rescues buried domains") {
    val lo = ZOrder.encodeLong(0L)
    val hi = ZOrder.encodeLong(100L)
    def n(v: Long) = ZOrder.normalize(ZOrder.encodeLong(v), lo, hi)
    assert(cmpU(n(10L), n(50L)) < 0 && cmpU(n(50L), n(90L)) < 0)
    assert(n(0L) === 0L)
    assert(cmpU(n(-5L), n(0L)) <= 0) // below-range clamps to the floor
    assert(n(200L) === n(100L)) // above-range clamps to the ceiling
    assert(ZOrder.normalize(lo, lo, lo) === 0L) // degenerate dim: constant word
    // the buried-domain case: a 0..100 key's variation reaches the TOP
    // bits once normalized (raw encoding leaves the top 50+ bits equal)
    assert(((n(80L) >>> 56) & 0xffL) > 0L)
  }

  test("interleave produces the Morton order") {
    // bit 63 of word 0 lands in output bit 0; bit 63 of word 1 in bit 1
    assert(ZOrder.interleave(Array(Long.MinValue, 0L))(0) === 0x80.toByte)
    assert(ZOrder.interleave(Array(0L, Long.MinValue))(0) === 0x40.toByte)
    // z-curve over a 4x4 grid: higher-order bits dominate across dims —
    // (x,y) quadrant ordering (0,0) < (1,1)-in-low-bits < cross-quadrant
    def morton(x: Long, y: Long) =
      ZOrder.interleave(Array(ZOrder.encodeLong(x), ZOrder.encodeLong(y)))
    val cells = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val ordered = cells.sortWith { (a, b) =>
      java.util.Arrays.compareUnsigned(morton(a._1, a._2), morton(b._1, b._2)) < 0
    }
    // the classic N-shaped 2D z-curve on a 4x4 grid
    assert(ordered.take(4) === Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    assert(ordered.slice(4, 8) === Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L)))
    assert(ordered.last === ((3L, 3L)))
  }

  test("zorder_key expression: codegen matches the interpreted path, null encodes as zero") {
    import spark.implicits._
    val df = Seq((5L, -3.5, "abc"), (-2L, 0.25, "zz"), (0L, 7.0, ""))
      .toDF("k", "v", "s")
    val rows = df.select(
      ZOrderFunctions.zorder_key(col("k"), col("v"), col("s")).as("z"),
      col("k"), col("v"), col("s")).collect()
    rows.foreach { r =>
      val expected = ZOrder.interleave(Array(
        ZOrder.encodeLong(r.getLong(1)),
        ZOrder.encodeDouble(r.getDouble(2)),
        ZOrder.encodeUtf8(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(3)))))
      assert(r.getAs[Array[Byte]](0) === expected)
    }
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(ZOrderFunctions.zorder_key(col("a"), col("b"))).head.getAs[Array[Byte]](0)
    assert(withNull === ZOrder.interleave(Array(ZOrder.encodeLong(1L), 0L)))
  }

  test("z-order prunes on EVERY ordered column; linear only on the leading one") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y").withColumn("payload", concat(lit("r"), col("x"), lit("_"), col("y")))

    val zt = cat.createTable("ns", "zgrid", grid.schema)
    zt.setZOrder("x", "y")
    zt.refresh().appendData(grid, numFiles = 16)

    val lt = cat.createTable("ns", "lgrid", grid.schema,
      sortOrder = Seq("x", "y"))
    lt.appendData(grid, numFiles = 16)

    val total = zt.refresh().metadata.currentFiles.size
    assert(total === 16)
    def survivors(t: LakeTable, p: LakePredicate) =
      t.refresh().newScan(p).planFiles.size
    val px = LakePredicate.Eq("x", Long.box(17L))
    val py = LakePredicate.Eq("y", Long.box(17L))

    // leading column prunes under both orders
    assert(survivors(zt, px) < total)
    assert(survivors(lt, px) < total)
    // the SECOND dimension prunes ONLY under z-order: every linear file
    // spans the full y domain
    assert(survivors(zt, py) < total,
      s"z-order file stats should be tight on y (got ${survivors(zt, py)}/$total)")
    assert(survivors(lt, py) === total)

    // and the scans stay exact in every case
    assert(zt.newScan(py).toDF(spark).count() === 64L)
    assert(lt.newScan(py).toDF(spark).count() === 64L)
    assert(zt.newScan().toDF(spark).count() === grid.count())
  }

  test("CoW update on the second dimension rewrites fewer files under z-order") {
    import spark.implicits._
    val cat = LakeCatalog.open(freshWarehouse())
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y").withColumn("payload", lit("p"))

    val zt = cat.createTable("ns", "zupd", grid.schema)
    zt.setZOrder("x", "y")
    zt.refresh().appendData(grid, numFiles = 16)
    val lt = cat.createTable("ns", "lupd", grid.schema, sortOrder = Seq("x", "y"))
    lt.appendData(grid, numFiles = 16)

    def rewritten(t: LakeTable) =
      t.refresh().metadata.currentSnapshot.get.summary("removed-data-files").toLong
    zt.refresh().updateWhere(spark, LakePredicate.Eq("y", Long.box(5L)),
      Map("payload" -> lit("u")))
    lt.refresh().updateWhere(spark, LakePredicate.Eq("y", Long.box(5L)),
      Map("payload" -> lit("u")))
    assert(rewritten(lt) === 16L) // linear: every file's y-range spans 5
    assert(rewritten(zt) < 16L,
      s"z-order update rewrote ${rewritten(zt)} of 16 files")
    // identical answers either way
    assert(zt.newScan().toDF(spark).filter(col("payload") === "u").count() === 64L)
    assert(lt.newScan().toDF(spark).filter(col("payload") === "u").count() === 64L)
  }

  test("SQL DDL zorder property, persistence across restart, and guards") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.zsql", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.zsql.warehouse", wh)
    spark.sql("CREATE NAMESPACE zsql.ns")
    spark.sql("CREATE TABLE zsql.ns.t (x BIGINT, y BIGINT, p STRING) " +
      "TBLPROPERTIES ('write.sort-order'='zorder(x, y)')")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    assert(t.metadata.sortOrder === Seq("x", "y"))
    assert(t.metadata.sortOrderKind === "zorder")
    // kind survives reopen (serialized metadata round trip)
    assert(LakeCatalog.open(wh).loadTable("ns", "t").metadata.sortOrderKind === "zorder")

    // guards: arity, unknown column, un-encodable type
    val cat = LakeCatalog.open(freshWarehouse())
    val g = cat.createTable("ns", "g", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.BinaryType))))
    intercept[IllegalArgumentException](g.setZOrder("a"))
    intercept[IllegalArgumentException](g.setZOrder("a", "nope"))
    intercept[IllegalArgumentException](g.setZOrder("a", "b")) // binary: no encoding
    // setWriteOrder resets the kind back to linear
    val t2 = cat.createTable("ns", "k", ordersDF.schema)
    t2.setZOrder("o_custkey", "o_totalprice")
    assert(t2.refresh().metadata.sortOrderKind === "zorder")
    t2.setWriteOrder("o_orderkey")
    assert(t2.refresh().metadata.sortOrderKind === "linear")
  }
}
