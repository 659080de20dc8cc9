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
  * Metadata is LAYERED the way the reference's Iceberg tables are
  * (manifest-list + manifest files, written by newAppend().commit(),
  * IntegrationTest.java:92-98): the versioned document
  * (`metadata/v{N}.json`) holds schema + spec + the snapshot LOG, where
  * each snapshot carries only POINTERS (`ManifestRef`) to immutable
  * per-commit manifest documents (`metadata/manifest-{uuid}.json`) that
  * hold the actual file entries. A commit therefore writes O(new files)
  * bytes — one manifest for the files it adds, rewrites only for
  * manifests it removes files from — never the whole history; and
  * loading a table parses only the log, with manifests fetched lazily
  * (and cached: they are immutable) when a scan actually plans files.
  *
  * File column stats are keyed by FIELD ID (and partition values by
  * spec position), not by column name — the same choice Iceberg makes —
  * so a column rename is a pure metadata-document change: no manifest
  * is ever rewritten, and historical snapshots prune correctly under
  * the current schema because the current name resolves to the same ID
  * the old files' stats were written under.
  *
  * JSON is hand-serialized (deterministic, no reflection) and parsed
  * with Jackson's tree API. formatVersion 2 (v1 embedded full file
  * lists in every snapshot; no v1 warehouses exist to migrate — every
  * file ever written by this engine carries parquet field IDs, which is
  * what licenses the unconditional ID-based read path in LakeTable).
  */
/** A copy-on-write commit lost its race: the files it rewrote were
  * removed by a concurrent commit between read and CAS — or rows
  * matching its predicate were added since its base snapshot. Retrying
  * the metadata transform would duplicate/resurrect/miss rows, so the
  * operation itself must be re-run against fresh metadata (Iceberg's
  * validateNoConflictingData behavior). */
final class CommitConflictException(msg: String) extends IllegalStateException(msg)

/** One schema-evolution step; a Seq of these applies as ONE atomic
  * metadata commit ([[LakeTable.alterSchema]]). */
sealed trait SchemaChange
object SchemaChange {
  final case class Add(name: String, dataType: org.apache.spark.sql.types.DataType)
      extends SchemaChange
  /** Add a column with an INITIAL DEFAULT (Iceberg v3's initial-default
    * / SQL `ADD COLUMN c T DEFAULT lit`): rows written BEFORE the add
    * read the default instead of null — per FILE, not per snapshot
    * (Spark's parquet reader fills a column absent from a file's footer
    * from the requested schema's existence-default metadata). The
    * default is a rendered SQL literal, top-level atomic columns only. */
  final case class AddWithDefault(name: String,
      dataType: org.apache.spark.sql.types.DataType,
      defaultSql: String) extends SchemaChange
  final case class Drop(name: String) extends SchemaChange
  final case class Rename(from: String, to: String) extends SchemaChange
  /** Lossless type promotion (Iceberg's allowed set): the column keeps
    * its field ID; old files' narrower physical values widen at read. */
  final case class Widen(name: String, dataType: org.apache.spark.sql.types.DataType)
      extends SchemaChange
}

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
  * Stat maps are keyed by FIELD ID rendered as a decimal string
  * (rename-proof; see [[TableMetadata.fieldIds]]), partition values by
  * spec position (`"p0"`, `"p1"`, …). Stat values are canonical
  * strings: numerics in decimal, timestamps as micros-since-epoch
  * longs, strings verbatim. */
final case class DataFileEntry(
    path: String,
    recordCount: Long,
    sizeBytes: Long,
    minValues: Map[String, String],
    maxValues: Map[String, String],
    nullCounts: Map[String, Long],
    partitionValues: Map[String, String],
    // which spec in TableMetadata.specLog this file's partitionValues
    // were derived under — files written before a spec evolution keep
    // pruning under THEIR OWN spec (Iceberg's spec-id-per-manifest-entry
    // design), and a spec evolution is a pure metadata commit
    specId: Int = 0,
    // data sequence number (Iceberg v2): the snapshot id of the commit
    // that ADDED this file. An equality-delete file tombstones rows of
    // data files with STRICTLY SMALLER seq — data landing in the same
    // or a later commit is untouched, which is what lets a MoR upsert
    // write its replacement rows and its tombstones in one commit.
    // Pre-seq entries read back 0 = "older than every delete" (safe).
    seq: Long = 0L,
    // for equality-delete entries only: the FIELD IDS of the key
    // columns this file tombstones on (rename-proof, like everything
    // else in the manifest); empty for data and positional entries
    eqFieldIds: Seq[Int] = Nil,
    // true for files REGISTERED in place by addFiles (Iceberg's
    // add_files/migrate): foreign parquet written outside the engine,
    // so its footers carry NO field IDs. Reads resolve its columns
    // through [[TableMetadata.nameMapping]] (import-time names) instead
    // of parquet field IDs; compaction/CoW rewrites emit native
    // ID-stamped files, clearing the flag. Pre-import manifests read
    // back false (every engine-written file carries IDs).
    nameMapped: Boolean = false,
    // row lineage (Iceberg v3 first-row-id): the table-wide id of this
    // file's FIRST row, assigned inside the commit CAS from
    // [[TableMetadata.nextRowId]] — a row's stable id is
    // firstRowId + its parquet row_index. None for pre-lineage
    // manifests; see LakeScan.rowLineage for the read contract (and
    // the loud refusal once a rewrite re-ids surviving rows).
    firstRowId: Option[Long] = None)

/** Pointer to one immutable manifest document plus the rollup counts
  * file planning needs WITHOUT loading it (totals, live-file count).
  * `content` separates DATA manifests from positional-DELETE manifests
  * (Iceberg's manifest content type): delete manifests list parquet
  * files of (file_path, pos) tombstones that merge-on-read scans
  * subtract, and they are excluded from data-file planning, rollups,
  * and conflict validation. */
/** A named ref: `kind` is "tag" (immutable) or "branch" (advanced by
  * branch commits / retargeted by fastForward). `createdAtMs` +
  * `maxRefAgeMs` give Iceberg's ref retention: [[LakeTable
  * .expireSnapshots]] drops a ref older than its max age (explicit, or
  * the `history.expire.max-ref-age-ms` table property when unset) and
  * then its pinned snapshots expire normally — without this a stale
  * audit branch pins history FOREVER on a heavy-churn table (a storage
  * leak, not a safety feature). createdAtMs 0 = pre-retention metadata:
  * such refs never age out (ageing them against epoch 0 would expire
  * them instantly the moment a default is set). */
final case class TableRef(kind: String, snapshotId: Long,
    createdAtMs: Long = 0L, maxRefAgeMs: Option[Long] = None)

object TableRef {
  val Tag = "tag"
  val Branch = "branch"
}

/** One per-snapshot statistics document (the Puffin-file analog):
  * `name` is an immutable stats-*.json under metadata/ holding the
  * ANALYZE blob for `snapshotId`. Referenced from
  * [[TableMetadata.statsFiles]]; unreferenced docs are reclaimed by
  * the orphan sweep like any other metadata document. */
final case class StatsFileRef(snapshotId: Long, name: String)

final case class ManifestRef(
    name: String, // document name under metadata/, e.g. manifest-<uuid>.json
    fileCount: Long,
    recordCount: Long,
    sizeBytes: Long,
    content: String = ManifestRef.Data,
    // Manifest-level skip stats (Iceberg's manifest-list partition
    // summaries + column-bound rollups): scan planning consults these
    // BEFORE opening the manifest document, so a selective predicate on
    // a clustered/partitioned table parses only the manifests that can
    // hold matches — planning stays sublinear in table size. A key is
    // present ONLY when EVERY entry in the manifest carries that stat
    // (same proof obligation as file-level pruning); pre-rollup
    // documents read back empty maps and are never skipped.
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty,
    // Partition-value summary: spec-position key ("p0") → the DISTINCT
    // values across entries, capped at [[ManifestRef.MaxSummaryValues]]
    // (beyond the cap the key is dropped — conservative). Exact-set
    // membership rather than bounds keeps it correct under the stringly
    // canonical partition encoding (no lexicographic-order trap on
    // numerics). Only meaningful when `specId` is defined.
    partitionValues: Map[String, Seq[String]] = Map.empty,
    // Some(id) iff every entry was written under the same partition
    // spec — partition keys are spec-POSITIONAL, so a mixed-spec
    // manifest cannot be summarized (None → no partition skipping).
    specId: Option[Int] = None)

object ManifestRef {
  val Data = "data"
  val Deletes = "deletes" // positional (file_path, pos) tombstones
  val EqDeletes = "eq-deletes" // key-value tombstones, seq-scoped
  // Deletion vectors (Iceberg v3): per-data-file compressed bitmaps
  // packed into per-commit blob files. An entry's path is its BLOB;
  // the referenced data file rides the entry's file_path min/max stats
  // (min == max), recordCount is the DV's cardinality and sizeBytes its
  // serialized length (the read-side broadcast gate's input). Commit
  // invariant: at most one live DV per data file (new DVs are merged by
  // the writer and REPLACE the old entry in the same commit).
  val Dv = "dv"

  /** Distinct-partition-value cap per summarized key: a manifest
    * spanning more partitions than this carries no summary for the key
    * (the doc would bloat and a predicate rarely prunes it anyway). */
  val MaxSummaryValues = 64

  /** Build a ref with rollup skip stats from the entries being written.
    * `keyTypes` maps stat key (field-ID string) → column type — the
    * comparator the canonical stat strings sort under; keys without a
    * type contribute no bounds (conservative, never wrong). */
  def of(name: String, files: Seq[DataFileEntry], content: String,
      keyTypes: Map[String, org.apache.spark.sql.types.DataType]): ManifestRef = {
    def everyFileKeys[V](m: DataFileEntry => Map[String, V]): Set[String] =
      if (files.isEmpty) Set.empty
      else files.map(m(_).keySet).reduce(_ intersect _)
    val minKeys = everyFileKeys(_.minValues).filter(keyTypes.contains)
    val maxKeys = everyFileKeys(_.maxValues).filter(keyTypes.contains)
    val mins = minKeys.map { k =>
      val t = keyTypes(k)
      k -> files.map(_.minValues(k)).reduce((a, b) => if (Stats.cmp(t, a, b) <= 0) a else b)
    }.toMap
    val maxs = maxKeys.map { k =>
      val t = keyTypes(k)
      k -> files.map(_.maxValues(k)).reduce((a, b) => if (Stats.cmp(t, a, b) >= 0) a else b)
    }.toMap
    val nulls = everyFileKeys(_.nullCounts)
      .map(k => k -> files.map(_.nullCounts(k)).sum).toMap
    val specIds = files.map(_.specId).distinct
    val specId = if (specIds.size == 1) Some(specIds.head) else None
    val parts =
      if (specId.isEmpty) Map.empty[String, Seq[String]]
      else everyFileKeys(_.partitionValues).flatMap { k =>
        val vs = files.map(_.partitionValues(k)).distinct.sorted
        if (vs.size <= MaxSummaryValues) Some(k -> vs) else None
      }.toMap
    ManifestRef(name, files.size.toLong, files.map(_.recordCount).sum,
      files.map(_.sizeBytes).sum, content, mins, maxs, nulls, parts, specId)
  }
}

/** Resolves the immutable manifest-layer documents (manifest lists and
  * manifests) behind a snapshot — implemented by the catalog with a
  * never-invalidating cache (the documents are write-once). */
trait ManifestIO {
  def readList(name: String): Seq[ManifestRef]
  def readManifest(name: String): Seq[DataFileEntry]
}

/** One commit. The snapshot embeds ONE pointer — its manifest-list
  * document (Iceberg's manifest-list layer) — plus rollup counts, so a
  * snapshot entry in the metadata document is O(1) however many
  * manifests or files it covers; `manifests` and `files` resolve lazily
  * through the catalog's cache (the IO handle sits in the second
  * parameter list, out of case-class equality). */
final case class Snapshot(
    id: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | replace | delete | overwrite
    manifestList: String, // snaplist-<uuid>.json under metadata/
    fileCount: Long,
    totalRecords: Long,
    totalSizeBytes: Long,
    summary: Map[String, String])(
    io: ManifestIO) {
  lazy val manifests: Seq[ManifestRef] = io.readList(manifestList)
  /** Live DATA manifest refs — the skip-stats surface scan planning
    * consults before deciding which documents to open at all. */
  def dataManifests: Seq[ManifestRef] =
    manifests.filter(_.content == ManifestRef.Data)
  /** Open ONE manifest document (for planners that skipped the rest). */
  def filesOf(m: ManifestRef): Seq[DataFileEntry] = io.readManifest(m.name)
  /** Complete live DATA manifest at this snapshot (lazy: union of the
    * referenced data manifest documents; each loads once per process).
    * Positional-delete manifests are deliberately excluded — every
    * existing caller (scans, CoW planning, CDC, orphan data sweep)
    * means "data files" by this. */
  lazy val files: Seq[DataFileEntry] =
    dataManifests.flatMap(m => io.readManifest(m.name))
  /** Live positional-delete files at this snapshot: parquet files of
    * (file_path, pos) tombstones a merge-on-read scan subtracts. */
  lazy val deleteFiles: Seq[DataFileEntry] =
    manifests.filter(_.content == ManifestRef.Deletes)
      .flatMap(m => io.readManifest(m.name))
  /** Live equality-delete files: parquet files of key VALUES that
    * tombstone every same-key row in data files with smaller seq. */
  lazy val eqDeleteFiles: Seq[DataFileEntry] =
    manifests.filter(_.content == ManifestRef.EqDeletes)
      .flatMap(m => io.readManifest(m.name))
  /** Live deletion-vector entries (one per tombstone-carrying data
    * file; entry path = the commit's blob file). */
  lazy val dvFiles: Seq[DataFileEntry] =
    manifests.filter(_.content == ManifestRef.Dv)
      .flatMap(m => io.readManifest(m.name))
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
    // which is what makes renamed columns resolve in old files; manifest
    // stats are keyed by the same IDs, which is what makes a rename a
    // metadata-only commit.
    fieldIds: Map[String, Int] = Map.empty,
    lastAssignedFieldId: Int = 0,
    // Spec log: every partition spec this table has ever had, in
    // evolution order (index = spec id); `spec` is always the LAST
    // entry (the default for new writes). Empty means "never evolved"
    // (pre-evolution documents and ad-hoc metadata) — accessor
    // `allSpecs` folds that back to Seq(spec). Old files keep pruning
    // under the spec they were written with via DataFileEntry.specId.
    specLog: Seq[Seq[PartitionField]] = Nil,
    // table-level key/value properties. Unlike snapshot summaries these
    // SURVIVE snapshot expiry, which is what makes them the right home
    // for the streaming exactly-once ledger (last committed batch id
    // per sink) — an expired ledger would let a checkpoint-recovery
    // replay double-append.
    properties: Map[String, String] = Map.empty,
    // Write order (Iceberg's SortOrder): every data-file write —
    // append, compaction, copy-on-write rewrite — range-clusters and
    // sorts rows on these columns, so file min/max stats become
    // disjoint on them and stats pruning turns a selective CoW
    // update/delete/merge from "rewrite half the table" into "rewrite
    // the overlapping files". Purely advisory for reads; changing it
    // is a metadata-only commit that never rewrites existing files.
    sortOrder: Seq[String] = Nil,
    // "linear" (lexicographic on sortOrder, Iceberg's default sort
    // order) or "zorder" (sort on the interleaved Morton code of the
    // sortOrder columns — file stats go tight in EVERY dimension, so
    // predicates on any ordered column prune; see
    // graft.functions.ZOrder). Absent in pre-zorder metadata → linear.
    sortOrderKind: String = "linear",
    // Named refs (Iceberg's branch/tag refs): name → (kind, snapshot).
    // A TAG pins a snapshot immutably; a BRANCH is an advanceable head
    // that branch commits move. "main" is implicit (currentSnapshotId)
    // and never appears here. Snapshot expiry always keeps ref targets.
    refs: Map[String, TableRef] = Map.empty,
    // Name mapping (Iceberg's schema.name-mapping.default): import-time
    // column name → field ID, FROZEN when [[LakeTable.addFiles]] first
    // registers foreign (ID-less) parquet carrying that column. Reads
    // of nameMapped files request these names and alias to the current
    // schema — a column renamed AFTER import keeps resolving in
    // imported files because the mapping still carries the name their
    // footers were written under. Empty until the first import.
    nameMapping: Map[String, Int] = Map.empty,
    // Initial defaults (Iceberg v3): field ID → rendered SQL literal.
    // A file whose footer LACKS the field reads the default instead of
    // null — exactly per file, via the requested schema's
    // existence-default metadata (Spark's parquet reader machinery).
    // ID-keyed so renames never detach a default; Drop retires it.
    initialDefaults: Map[Int, String] = Map.empty,
    // Per-snapshot statistics documents (Iceberg's `statistics` list of
    // Puffin files): ANALYZE writes its NDV/null/length blob as an
    // immutable stats-*.json document and records (analyzed snapshot,
    // name) here — one small ref per analyze instead of the whole blob
    // in properties, so wide tables don't inflate every metadata
    // rewrite and old snapshots keep their own stats across time
    // travel. Append order = analyze order (last entry is freshest).
    statsFiles: Seq[StatsFileRef] = Nil,
    // Snapshot-id HIGH-WATER MARK (Iceberg's last-snapshot-id): ids
    // allocate max(log, this)+1 so rollback + expiry can NEVER reuse
    // an id — reuse at or below a streaming checkpoint's offset makes
    // ancestorsAfter treat new commits as already read (silent loss in
    // an exactly-once pipeline). Pre-field documents read back 0 and
    // become monotone at their first post-upgrade commit.
    lastSnapshotId: Long = 0L,
    // Row-lineage high-water mark (Iceberg v3 next-row-id): the first
    // row id the NEXT commit's data files will be assigned. Advanced
    // inside the commit CAS by the total record count of added files,
    // so ids are table-unique and monotone even under commit races
    // (the loser's retry re-reads the winner's mark). Pre-lineage
    // documents read back 0 — their existing files carry no
    // firstRowId, and the lineage read surface refuses on them.
    nextRowId: Long = 0L,
    // Per-snapshot PARTITION statistics documents (Iceberg's
    // partition-statistics files): computePartitionStats rolls the
    // per-partition-tuple file/record/byte counts into an immutable
    // doc so the `partitions` inspection table answers O(#partitions)
    // without touching a manifest — on a million-file table the
    // difference between a lookup and a full driver parse. Same
    // lifecycle as statsFiles: replace-per-snapshot, expiry
    // dereferences, orphan sweep reclaims.
    partitionStats: Seq[StatsFileRef] = Nil) {
  def currentSnapshot: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.id == id)
  def currentFiles: Seq[DataFileEntry] = currentSnapshot.map(_.files).getOrElse(Nil)

  /** Every spec this table has had (index = spec id); never empty. */
  def allSpecs: Seq[Seq[PartitionField]] = if (specLog.nonEmpty) specLog else Seq(spec)
  /** Spec id new data files are written under (the last in the log). */
  def currentSpecId: Int = allSpecs.size - 1
  /** The spec a given file's partitionValues were derived under —
    * falls back to the current spec for out-of-range ids (prunes
    * conservatively: indexOf misses → no pruning). */
  def specFor(f: DataFileEntry): Seq[PartitionField] =
    allSpecs.lift(f.specId).getOrElse(spec)

  /** A file's partition values re-keyed from the positional manifest
    * form (`p<i>`) to the field render of its OWN spec —
    * `o_orderstatus` or `month(o_orderdate)` — the human/SQL-facing
    * form the inspection surfaces share. */
  def readablePartition(f: DataFileEntry): Map[String, String] = {
    val fSpec = specFor(f)
    f.partitionValues.map { case (k, v) =>
      (if (k.startsWith("p")) k.drop(1).toIntOption else None)
        .flatMap(fSpec.lift).map(_.render).getOrElse(k) -> v
    }
  }

  /** Manifest stat-map key for a column under the CURRENT schema —
    * None for unknown columns (prune conservatively). */
  def statKey(colName: String): Option[String] = fieldIds.get(colName).map(_.toString)

  /** Stat key → column type for every TOP-LEVEL column (the only ones
    * the harvester collects bounds for) — the comparator map manifest
    * rollups sort canonical stat strings under. */
  def statKeyTypes: Map[String, org.apache.spark.sql.types.DataType] =
    schema.fields.iterator
      .flatMap(f => fieldIds.get(f.name).map(id => id.toString -> f.dataType))
      .toMap

  /** Metadata built ad hoc (tests, external tools) gets positional IDs
    * 1..n — the same assignment createTable performs. Guarded on
    * lastAssignedFieldId too: a table whose columns were ALL dropped has
    * empty fieldIds but a real high-water mark, and resetting it would
    * let addColumn reuse a retired ID — resurrecting the dropped
    * column's bytes from old files. */
  def withFieldIdDefaults: TableMetadata =
    if (fieldIds.nonEmpty || lastAssignedFieldId > 0) this
    else {
      // preorder paths: for a flat schema this is exactly the old
      // top-level 1..n numbering; struct columns additionally get IDs
      // for their nested fields (dotted paths), which is what makes
      // nested-field rename a metadata-only, ID-addressed commit
      val paths = TableMetadata.fieldPaths(schema)
      copy(
        fieldIds = paths.zipWithIndex.map { case (p, i) => (p, i + 1) }.toMap,
        lastAssignedFieldId = paths.size)
    }

  /** The schema with parquet field-ID metadata injected per field — the
    * form handed to Spark's parquet reader/writer, never to users.
    * Struct columns inject RECURSIVELY under their dotted paths, so
    * writes stamp nested parquet field IDs and reads resolve renamed
    * nested fields in old files by ID. */
  def schemaWithFieldIds: StructType = {
    // collections recurse through the Iceberg path markers: fields of
    // an array's element struct stamp under `path.element.*`, of a
    // map's value struct under `path.value.*` (keys stay unaddressed)
    def injectType(dt: org.apache.spark.sql.types.DataType,
        path: String): org.apache.spark.sql.types.DataType = dt match {
      case s: StructType => inject(s, path)
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = injectType(a.elementType, s"$path.element"))
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(valueType = injectType(m.valueType, s"$path.value"))
      case other => other
    }
    def inject(st: StructType, prefix: String): StructType =
      StructType(st.fields.map { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val typed = f.copy(dataType = injectType(f.dataType, path))
        fieldIds.get(path) match {
          case Some(id) =>
            val b = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(typed.metadata)
              .putLong("parquet.field.id", id.toLong)
            // existence default: the parquet reader fills this field
            // from the literal when a FILE's footer lacks it — the
            // initial-default read semantic, exactly per file. The
            // CURRENT_DEFAULT twin makes SQL INSERTs that omit the
            // column fill it (Spark's ResolveDefaultColumns)
            initialDefaults.get(id).foreach { sql =>
              b.putString(org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
                .EXISTS_DEFAULT_COLUMN_METADATA_KEY, sql)
              b.putString(org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
                .CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql)
            }
            typed.copy(metadata = b.build())
          case None => typed
        }
      })
    inject(schema, "")
  }
}

object TableMetadata {
  /** Every ID-addressable field path of a schema, preorder: top-level
    * fields; recursively, fields of struct columns as dotted paths; and
    * fields of structs INSIDE collections through the Iceberg path
    * markers — `arr.element.f` for array elements, `m.value.f` for map
    * values (map KEYS are identity, never addressed — evolving a key
    * would re-key every row). The markers are unambiguous: they only
    * apply when the enclosing type IS a collection, so a struct field
    * literally named "element" still addresses normally. */
  def fieldPaths(schema: StructType): Seq[String] = walkStruct(schema, "")

  private def walkStruct(st: StructType, prefix: String): Seq[String] =
    st.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      p +: nestedPaths(f.dataType, p)
    }

  /** ID-addressable paths UNDER a field of type `dt` rooted at `p`. */
  def nestedPaths(dt: org.apache.spark.sql.types.DataType, p: String): Seq[String] =
    dt match {
      case s: StructType => walkStruct(s, p)
      case a: org.apache.spark.sql.types.ArrayType =>
        nestedPaths(a.elementType, s"$p.element")
      case m: org.apache.spark.sql.types.MapType =>
        nestedPaths(m.valueType, s"$p.value")
      case _ => Nil
    }
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
      s""""nullCounts":${longMap(f.nullCounts)},"partitionValues":${strMap(f.partitionValues)},""" +
      s""""specId":${f.specId},"seq":${f.seq},""" +
      s""""eqFieldIds":${f.eqFieldIds.mkString("[", ",", "]")}""" +
      // emitted only when set: pre-import manifest documents stay
      // byte-identical (their readers default the field to false)
      (if (f.nameMapped) ""","nameMapped":true""" else "") +
      f.firstRowId.fold("")(r => s""","firstRowId":$r""") + "}"

  private def snapshotJson(s: Snapshot): String =
    s"""{"id":${s.id},"parentId":${s.parentId.map(_.toString).getOrElse("null")},""" +
      s""""timestampMs":${s.timestampMs},"operation":${q(s.operation)},""" +
      s""""manifestList":${q(s.manifestList)},"fileCount":${s.fileCount},""" +
      s""""totalRecords":${s.totalRecords},"totalSizeBytes":${s.totalSizeBytes},""" +
      s""""summary":${strMap(s.summary)}}"""

  def write(m: TableMetadata): String =
    s"""{"formatVersion":2,"name":${q(m.name)},"location":${q(m.location)},""" +
      s""""schema":${m.schema.json},""" +
      s""""fieldIds":${m.fieldIds.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")},""" +
      s""""lastAssignedFieldId":${m.lastAssignedFieldId},""" +
      s""""properties":${strMap(m.properties)},""" +
      s""""sortOrder":${m.sortOrder.map(q).mkString("[", ",", "]")},""" +
      s""""sortOrderKind":${q(m.sortOrderKind)},""" +
      s""""refs":${m.refs.toSeq.sortBy(_._1).map { case (n, r) =>
        s"${q(n)}:{\"kind\":${q(r.kind)},\"snapshotId\":${r.snapshotId}" +
          s",\"createdAtMs\":${r.createdAtMs}" +
          r.maxRefAgeMs.fold("")(a => s",\"maxRefAgeMs\":$a") + "}"
      }.mkString("{", ",", "}")},""" +
      // emitted only once an import froze names: pre-import metadata
      // documents stay byte-identical (readers default to empty)
      (if (m.nameMapping.nonEmpty)
        s""""nameMapping":${m.nameMapping.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")},"""
      else "") +
      (if (m.initialDefaults.nonEmpty)
        s""""initialDefaults":${m.initialDefaults.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k.toString)}:${q(v)}" }.mkString("{", ",", "}")},"""
      else "") +
      // emitted only once ANALYZE ran: pre-stats documents stay
      // byte-identical (readers default to empty)
      (if (m.statsFiles.nonEmpty)
        s""""statsFiles":${m.statsFiles.map(sf =>
          s"""{"snapshotId":${sf.snapshotId},"name":${q(sf.name)}}""")
          .mkString("[", ",", "]")},"""
      else "") +
      (if (m.partitionStats.nonEmpty)
        s""""partitionStats":${m.partitionStats.map(sf =>
          s"""{"snapshotId":${sf.snapshotId},"name":${q(sf.name)}}""")
          .mkString("[", ",", "]")},"""
      else "") +
      (if (m.lastSnapshotId > 0L)
        s""""lastSnapshotId":${m.lastSnapshotId},"""
      else "") +
      (if (m.nextRowId > 0L)
        s""""nextRowId":${m.nextRowId},"""
      else "") +
      s""""spec":${specJson(m.spec)},""" +
      s""""specLog":${m.allSpecs.map(specJson).mkString("[", ",", "]")},""" +
      s""""snapshots":${m.snapshots.map(snapshotJson).mkString("[", ",", "]")},""" +
      s""""currentSnapshotId":${m.currentSnapshotId}}"""

  private def specJson(spec: Seq[PartitionField]): String =
    spec.map(p => s"""{"source":${q(p.source)},"transform":${q(p.transform)}}""")
      .mkString("[", ",", "]")

  /** One manifest document: the file entries a commit wrote it with. */
  def writeManifest(files: Seq[DataFileEntry]): String =
    files.map(fileJson).mkString("""{"files":[""", ",", "]}")

  def readManifest(json: String): Seq[DataFileEntry] =
    mapper.readTree(json).get("files").elements().asScala.map(parseFile).toSeq

  /** One manifest-list document: the refs whose union is a snapshot's
    * live file set. */
  def writeManifestList(refs: Seq[ManifestRef]): String =
    refs.map { m =>
      val summary =
        (if (m.minValues.isEmpty) "" else s""","minValues":${strMap(m.minValues)}""") +
          (if (m.maxValues.isEmpty) "" else s""","maxValues":${strMap(m.maxValues)}""") +
          (if (m.nullCounts.isEmpty) "" else s""","nullCounts":${longMap(m.nullCounts)}""") +
          (if (m.partitionValues.isEmpty) "" else s""","partitionValues":${
            m.partitionValues.toSeq.sortBy(_._1).map { case (k, vs) =>
              s"${q(k)}:${vs.map(q).mkString("[", ",", "]")}"
            }.mkString("{", ",", "}")}""") +
          m.specId.map(id => s""","specId":$id""").getOrElse("")
      s"""{"name":${q(m.name)},"fileCount":${m.fileCount},""" +
        s""""recordCount":${m.recordCount},"sizeBytes":${m.sizeBytes},""" +
        s""""content":${q(m.content)}$summary}"""
    }.mkString("""{"manifests":[""", ",", "]}")

  def readManifestList(json: String): Seq[ManifestRef] =
    mapper.readTree(json).get("manifests").elements().asScala.map(m => ManifestRef(
      name = m.get("name").asText(),
      fileCount = m.get("fileCount").asLong(),
      recordCount = m.get("recordCount").asLong(),
      sizeBytes = m.get("sizeBytes").asLong(),
      content = Option(m.get("content")).map(_.asText())
        .getOrElse(ManifestRef.Data),
      // absent on pre-rollup documents → empty → never skipped
      minValues = Option(m.get("minValues")).map(asStrMap).getOrElse(Map.empty),
      maxValues = Option(m.get("maxValues")).map(asStrMap).getOrElse(Map.empty),
      nullCounts = Option(m.get("nullCounts")).map(asLongMap).getOrElse(Map.empty),
      partitionValues = Option(m.get("partitionValues")).map(n =>
        n.properties().asScala.map(e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq).toMap)
        .getOrElse(Map.empty),
      specId = Option(m.get("specId")).map(_.asInt()))).toSeq

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
    partitionValues = asStrMap(n.get("partitionValues")),
    specId = Option(n.get("specId")).map(_.asInt()).getOrElse(0),
    seq = Option(n.get("seq")).map(_.asLong()).getOrElse(0L),
    eqFieldIds = Option(n.get("eqFieldIds"))
      .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
    nameMapped = Option(n.get("nameMapped")).exists(_.asBoolean()),
    firstRowId = Option(n.get("firstRowId")).map(_.asLong()))

  private def parseSpec(n: JsonNode): Seq[PartitionField] =
    n.elements().asScala
      .map(p => PartitionField(p.get("source").asText(), p.get("transform").asText())).toSeq

  private def parseSnapshot(n: JsonNode, io: ManifestIO): Snapshot =
    Snapshot(
      id = n.get("id").asLong(),
      parentId = if (n.get("parentId").isNull) None else Some(n.get("parentId").asLong()),
      timestampMs = n.get("timestampMs").asLong(),
      operation = n.get("operation").asText(),
      manifestList = n.get("manifestList").asText(),
      fileCount = n.get("fileCount").asLong(),
      totalRecords = n.get("totalRecords").asLong(),
      totalSizeBytes = n.get("totalSizeBytes").asLong(),
      summary = asStrMap(n.get("summary")))(io)

  /** Parse a metadata document. `io` resolves manifest-layer document
    * names to their parsed contents — the catalog passes its cached
    * backend reader; the documents are immutable so the cache never
    * invalidates. */
  def read(json: String, io: ManifestIO): TableMetadata = {
    val n = mapper.readTree(json)
    // refuse pre-manifest-list documents loudly: a v1 snapshot embeds
    // its file list and has no "manifestList" key, which would otherwise
    // surface as an opaque NPE deep in parseSnapshot
    val fv = Option(n.get("formatVersion")).map(_.asInt()).getOrElse(1)
    if (fv != 2)
      throw new IllegalStateException(
        s"unsupported table formatVersion $fv (this engine reads/writes " +
          "formatVersion 2; recreate the table or migrate its metadata)")
    TableMetadata(
      name = n.get("name").asText(),
      location = n.get("location").asText(),
      schema = DataType.fromJson(mapper.writeValueAsString(n.get("schema"))).asInstanceOf[StructType],
      spec = parseSpec(n.get("spec")),
      specLog = Option(n.get("specLog"))
        .map(_.elements().asScala.map(parseSpec).toSeq).getOrElse(Nil),
      snapshots = n.get("snapshots").elements().asScala.map(parseSnapshot(_, io)).toSeq,
      currentSnapshotId = n.get("currentSnapshotId").asLong(),
      fieldIds = Option(n.get("fieldIds"))
        .map(m => m.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap)
        .getOrElse(Map.empty),
      lastAssignedFieldId = Option(n.get("lastAssignedFieldId")).map(_.asInt()).getOrElse(0),
      properties = Option(n.get("properties")).map(asStrMap).getOrElse(Map.empty),
      sortOrder = Option(n.get("sortOrder"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
      sortOrderKind = Option(n.get("sortOrderKind")).map(_.asText()).getOrElse("linear"),
      refs = Option(n.get("refs")).map(r =>
        r.properties().asScala.map { e =>
          e.getKey -> TableRef(e.getValue.get("kind").asText(),
            e.getValue.get("snapshotId").asLong(),
            createdAtMs = Option(e.getValue.get("createdAtMs"))
              .map(_.asLong()).getOrElse(0L),
            maxRefAgeMs = Option(e.getValue.get("maxRefAgeMs")).map(_.asLong()))
        }.toMap).getOrElse(Map.empty),
      nameMapping = Option(n.get("nameMapping"))
        .map(m => m.properties().asScala.map(e => e.getKey -> e.getValue.asInt()).toMap)
        .getOrElse(Map.empty),
      initialDefaults = Option(n.get("initialDefaults"))
        .map(m => m.properties().asScala
          .map(e => e.getKey.toInt -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty),
      statsFiles = Option(n.get("statsFiles"))
        .map(_.elements().asScala.map(s => StatsFileRef(
          s.get("snapshotId").asLong(), s.get("name").asText())).toSeq)
        .getOrElse(Nil),
      partitionStats = Option(n.get("partitionStats"))
        .map(_.elements().asScala.map(s => StatsFileRef(
          s.get("snapshotId").asLong(), s.get("name").asText())).toSeq)
        .getOrElse(Nil),
      lastSnapshotId = Option(n.get("lastSnapshotId"))
        .map(_.asLong()).getOrElse(0L),
      nextRowId = Option(n.get("nextRowId"))
        .map(_.asLong()).getOrElse(0L)
    ).withFieldIdDefaults // ad-hoc documents get positional IDs
  }
}
