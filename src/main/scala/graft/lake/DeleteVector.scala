package graft.lake

/** Per-data-file DELETION VECTOR (Iceberg v3's headline MoR change): a
  * compressed bitmap of deleted row indexes, replacing row-granular
  * (file_path, pos) parquet tombstones. Storage is O(bitmap) instead of
  * O(deleted rows × path bytes), the table-format invariant is AT MOST
  * ONE live DV per data file (writers merge, commits replace), and the
  * read side applies a DV as a map-side codegen'd FILTER — no join, no
  * shuffle, the data scan stays in one whole-stage-codegen span.
  *
  * Layout is a roaring-style two-level index: positions split into a
  * high word (`pos >>> 16`) and a 16-bit low part; each high word owns a
  * container that is either a SORTED ARRAY of 16-bit values (sparse,
  * ≤ [[DeleteVector.SparseMax]] entries — 2 bytes/position) or a 64 Kbit
  * BITMAP (dense — 8 KB flat). This bounds memory at ~1 bit/row worst
  * case while keeping point lookups O(log sparse) / O(1) dense, the
  * reference shape of RoaringBitmap (public format; implemented from
  * scratch here — no library dependency).
  *
  * Instances are immutable and Serializable (they ride Spark
  * broadcasts); [[union]] is the writer-side merge that maintains the
  * one-live-DV invariant. */
final class DeleteVector private (
    private val keys: Array[Long], // sorted container high words
    private val containers: Array[AnyRef], // Array[Char] sparse | Array[Long] dense
    val cardinality: Long) extends Serializable {

  /** Is row index `pos` deleted? */
  def contains(pos: Long): Boolean = {
    val key = pos >>> 16
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i < 0) false
    else containers(i) match {
      case sparse: Array[Char] =>
        java.util.Arrays.binarySearch(sparse, (pos & 0xFFFF).toChar) >= 0
      case dense: Array[Long] =>
        val low = (pos & 0xFFFF).toInt
        (dense(low >>> 6) & (1L << (low & 63))) != 0L
    }
  }

  /** Deleted positions in ascending order (the over-budget read path
    * expands DVs into (path, pos) rows for a distributed anti-join). */
  def positions: Iterator[Long] = keys.iterator.zip(containers.iterator).flatMap {
    case (key, sparse: Array[Char]) =>
      sparse.iterator.map(c => (key << 16) | c.toLong)
    case (key, dense: Array[Long]) =>
      Iterator.range(0, 1 << 16).filter(low =>
        (dense(low >>> 6) & (1L << (low & 63))) != 0L)
        .map(low => (key << 16) | low.toLong)
    case (_, other) => throw new IllegalStateException(s"container $other")
  }

  /** Bitwise OR — the writer-side merge keeping one live DV per file. */
  def union(other: DeleteVector): DeleteVector = {
    val it = new DeleteVector.SortedMerge(positions, other.positions)
    DeleteVector.fromSorted(it)
  }

  /** Positions in this vector but NOT in `other` — the per-commit DV
    * DELTA (new DVs are supersets of the ones they replace, so
    * `current minus parent` is exactly what one commit deleted: the
    * changelog's delete set). */
  def minus(other: DeleteVector): DeleteVector =
    DeleteVector.fromSorted(positions.filterNot(other.contains))

  /** Compact binary form (container-preserving, stable across JVMs). */
  def serialize: Array[Byte] = {
    var size = 8 + 4 // cardinality, nKeys
    keys.indices.foreach { i =>
      size += 8 + 1 + 4 + (containers(i) match {
        case s: Array[Char] => s.length * 2
        case d: Array[Long] => d.length * 8
      })
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(cardinality).putInt(keys.length)
    keys.indices.foreach { i =>
      bb.putLong(keys(i))
      containers(i) match {
        case s: Array[Char] =>
          bb.put(0: Byte).putInt(s.length)
          s.foreach(c => bb.putChar(c))
        case d: Array[Long] =>
          bb.put(1: Byte).putInt(d.length)
          d.foreach(bb.putLong)
      }
    }
    bb.array()
  }
}

object DeleteVector {
  /** Container flips sparse → dense above this (4096 × 2 B = the 8 KB
    * bitmap — the RoaringBitmap break-even point). */
  val SparseMax = 4096

  val Empty: DeleteVector = new DeleteVector(Array.empty, Array.empty, 0L)

  /** Build from ASCENDING, deduplicated positions. */
  def fromSorted(it: Iterator[Long]): DeleteVector = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val containers = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val lows = new Array[Char](1 << 16)
    var nLows = 0
    var curKey = -1L
    var n = 0L
    var last = -1L
    def flush(): Unit = if (curKey >= 0) {
      keys += curKey
      containers += (if (nLows <= SparseMax) java.util.Arrays.copyOf(lows, nLows)
      else {
        val dense = new Array[Long](1024)
        var i = 0
        while (i < nLows) {
          val low = lows(i).toInt
          dense(low >>> 6) |= 1L << (low & 63)
          i += 1
        }
        dense
      })
    }
    while (it.hasNext) {
      val pos = it.next()
      require(pos >= 0, s"negative row position $pos")
      require(pos > last, s"positions must be ascending and distinct ($pos after $last)")
      last = pos
      val key = pos >>> 16
      if (key != curKey) { flush(); curKey = key; nLows = 0 }
      lows(nLows) = (pos & 0xFFFF).toChar
      nLows += 1
      n += 1L
    }
    flush()
    if (n == 0L) Empty
    else new DeleteVector(keys.toArray, containers.toArray, n)
  }

  def deserialize(bytes: Array[Byte]): DeleteVector = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val cardinality = bb.getLong
    val nKeys = bb.getInt
    val keys = new Array[Long](nKeys)
    val containers = new Array[AnyRef](nKeys)
    var i = 0
    while (i < nKeys) {
      keys(i) = bb.getLong
      val kind = bb.get()
      val len = bb.getInt
      containers(i) =
        if (kind == 0) Array.fill(len)(bb.getChar)
        else Array.fill(len)(bb.getLong)
      i += 1
    }
    new DeleteVector(keys, containers, cardinality)
  }

  // ---- blob packing -------------------------------------------------
  // One BLOB FILE per DV commit carries every (data file → DV) the
  // commit produced (the role Iceberg v3 gives puffin): a delete of a
  // million rows across 10k files writes ONE object, not 10k — object
  // stores price small-file floods in latency and request fees.
  // Manifest entries all share the blob path; each records its own
  // referenced data file (min==max file_path stats), cardinality
  // (recordCount) and serialized length (sizeBytes — the broadcast
  // gate's input).

  private val BlobMagic = 0x47445631 // "GDV1"

  def writeBlob(dvs: Seq[(String, DeleteVector)]): Array[Byte] = {
    val parts = dvs.map { case (path, dv) =>
      (path.getBytes(java.nio.charset.StandardCharsets.UTF_8), dv.serialize)
    }
    val bb = java.nio.ByteBuffer.allocate(
      8 + parts.map { case (p, d) => 8 + p.length + d.length }.sum)
    bb.putInt(BlobMagic).putInt(parts.size)
    parts.foreach { case (p, d) =>
      bb.putInt(p.length).put(p).putInt(d.length).put(d)
    }
    bb.array()
  }

  def readBlob(bytes: Array[Byte]): Seq[(String, DeleteVector)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt == BlobMagic, "not a graft deletion-vector blob")
    (0 until bb.getInt).map { _ =>
      val p = new Array[Byte](bb.getInt)
      bb.get(p)
      val d = new Array[Byte](bb.getInt)
      bb.get(d)
      (new String(p, java.nio.charset.StandardCharsets.UTF_8),
        DeleteVector.deserialize(d))
    }
  }

  /** Merge two ascending iterators, dropping duplicates. */
  private final class SortedMerge(a: Iterator[Long], b: Iterator[Long])
      extends Iterator[Long] {
    private val pa = a.buffered
    private val pb = b.buffered
    def hasNext: Boolean = pa.hasNext || pb.hasNext
    def next(): Long =
      if (!pb.hasNext) pa.next()
      else if (!pa.hasNext) pb.next()
      else {
        val x = pa.head
        val y = pb.head
        if (x < y) pa.next()
        else if (y < x) pb.next()
        else { pa.next(); pb.next() }
      }
  }
}
