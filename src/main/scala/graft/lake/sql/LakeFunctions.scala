package graft.lake.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog's V2 FUNCTION surface (Iceberg's SparkFunctions
  * analog): the partition transforms as loadable functions, which is
  * what lets Spark resolve a `bucket(n, col)` clustering expression in
  * a reported KeyGroupedPartitioning — bucket-partitioned tables then
  * storage-partition-join exactly like identity-partitioned ones, the
  * high-cardinality co-location real fact-to-fact joins need.
  *
  * The bound function computes pmod(murmur3(col, seed 42), n) — BIT
  * IDENTICAL to the write path's `F.pmod(F.hash(c), n)`
  * (Model.PartitionField.toColumn), because a function that disagreed
  * with the layout it describes would co-locate the wrong rows. */
object LakeFunctions {

  val names: Seq[String] = Seq("bucket")

  def unbound(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case _ => None
  }

  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, col): pmod(murmur3(col), numBuckets) — the write-path partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket takes (numBuckets, col); got ${inputType.simpleString}")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument is the bucket count (int); got ${inputType.fields(0).dataType}")
      BucketBound(inputType.fields(1).dataType)
    }
  }

  final case class BucketBound(colType: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // equality of canonicalName (plus bucket count) is what makes two
    // sides' TransformExpressions compatible for a shuffle-free join;
    // type-scoped so an int-keyed and a string-keyed bucket never
    // claim compatibility
    override def canonicalName(): String = s"graft.bucket(${colType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v = input.get(1, colType)
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(v, colType, 42L).toInt
      ((h % n) + n) % n
    }
  }
}
