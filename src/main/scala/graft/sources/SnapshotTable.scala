package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** `[EXT]` manifest-committed snapshot table — atomic multi-partition
  * commits and snapshot-isolated readers for a plain-parquet table,
  * following the published Iceberg/Delta construction (a log of
  * immutable manifests naming immutable data files; readers pin one
  * manifest; writers race on publishing the next). [[Upsert]] mutates
  * partition directories in place — its two-rename swap is atomic per
  * partition but a reader planned mid-loop can see partition A new and
  * partition B old. Here a commit is ONE atomic event (the manifest
  * rename), data files are never modified or renamed after creation,
  * and old snapshots remain readable until [[vacuum]].
  *
  * Layout:
  * {{{
  *   table/data/<commit>-part-*.parquet   immutable; partition column
  *                                        stored IN the rows (no hive dirs)
  *   table/_manifests/v<N>.json           immutable; one line per file:
  *                                        {"path","parts":[...],"rows"}
  * }}}
  *
  * Commit protocol (optimistic, Iceberg's HadoopTableOperations shape):
  * write data files → write `v<N+1>.json.tmp.<uuid>` → RENAME to
  * `v<N+1>.json`. The rename is the commit point: it fails if a
  * concurrent writer published N+1 first (loud conflict, caller re-reads
  * and retries); a crash before it leaves orphan files that no manifest
  * references (cleaned by [[vacuum]], invisible to readers). Version
  * discovery lists `_manifests` — small (one entry per commit), so no
  * hint file is needed; a real object-store deployment would add one as
  * a fast path.
  *
  * Scale shape: planning reads ONE small manifest — no recursive
  * directory listing (the 100 TB killer for hive layouts). Partition
  * pruning becomes manifest-level FILE SKIPPING: each entry records the
  * file's partition values (the writer emits exactly one value per
  * file), and [[readWhere]] plans only intersecting files.
  * [[commitMerge]] is the
  * snapshot-isolated MERGE: affected files (batch partitions + detected
  * cross-partition movers, both at FILE granularity) are read, merged,
  * and replaced in the next manifest; untouched files are carried over
  * by reference — zero IO, zero rewrite.
  */
object SnapshotTable extends QueryPack {

  /** Per-file min/max of one numeric column (stored as doubles — exact
    * for bigint keys up to 2^53). The column NAME rides along so a read
    * pruning on a different column can never skip on the wrong stats.
    */
  final case class ColStats(col: String, lo: Double, hi: Double)

  /** One manifest line. `parts` is the file's partition-value list
    * (`None` = unknown, never skipped — reserved for future multi-value
    * files; the current writer emits exactly one value per file).
    * `stats` is the optional column min/max for range skipping (`None`
    * = never range-skipped).
    */
  final case class FileEntry(path: String, parts: Option[Seq[String]],
                             rows: Long, stats: Option[ColStats] = None)

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")
  private def dataDir(table: String) = new Path(table, "data")

  private val vRe = raw"v(\d+)\.json".r

  /** Committed versions, ascending (listing `_manifests`, tmp files and
    * debris ignored).
    */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case vRe(n) => Some(n.toLong)
      case _      => None
    }).sorted
  }

  def currentVersion(spark: SparkSession, table: String): Long =
    versions(spark, table).lastOption.getOrElse(
      sys.error(s"snapshot table $table has no committed version"))

  // ---- manifest (de)serialization: flat JSON lines, repo-escaped

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }
  private def unesc(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
            case c   => b.append(c); i += 2
          }
        case c => b.append(c); i += 1
      }
    }
    b.toString
  }

  private def entryJson(e: FileEntry): String = {
    val parts = e.parts match {
      case None     => "\"*\""
      case Some(ps) => ps.map(p => "\"" + esc(p) + "\"").mkString("[", ",", "]")
    }
    val stats = e.stats.fold("") { s =>
      s""","stats":{"col":"${esc(s.col)}","lo":${s.lo},"hi":${s.hi}}"""
    }
    s"""{"path":"${esc(e.path)}","parts":$parts,"rows":${e.rows}$stats}"""
  }

  private val entryRe =
    raw"""\{"path":"(.*)","parts":(\[.*\]|"\*"),"rows":(\d+)(,"stats":\{"col":"(.*)","lo":([-0-9.eE]+),"hi":([-0-9.eE]+)\})?\}""".r
  private val quotedRe = "\"((?:[^\"\\\\]|\\\\.)*)\"".r

  private def parseEntry(line: String): FileEntry = line.trim match {
    case entryRe(p, parts, rows, statsGrp, sCol, sLo, sHi) =>
      val ps = if (parts == "\"*\"") None
        else Some(quotedRe.findAllMatchIn(parts).map(m => unesc(m.group(1))).toSeq)
      val stats = Option(statsGrp).map(_ =>
        ColStats(unesc(sCol), sLo.toDouble, sHi.toDouble))
      FileEntry(unesc(p), ps, rows.toLong, stats)
    case other => sys.error(s"snapshot manifest: bad entry: $other")
  }

  /** Version-level metadata riding the manifest's header line: the
    * cumulative committed-tag ledger and the table's CURRENT schema as
    * a DDL string. Tags live here (not in file names) because
    * [[compact]] renames data files; the schema lives here because
    * schema evolution must not rewrite old files — readers apply the
    * recorded schema and parquet fills absent columns with null.
    */
  final case class Header(tags: Set[String] = Set.empty,
                          schema: Option[String] = None)

  def readManifest(spark: SparkSession, table: String, version: Long): Seq[FileEntry] =
    readManifestFull(spark, table, version)._1

  private val headerRe =
    raw"""\{"tags":\[(.*)\](,"schema":"(.*)")?\}""".r

  /** Manifest entries plus the header (tag ledger + recorded schema). */
  def readManifestFull(spark: SparkSession, table: String,
                       version: Long): (Seq[FileEntry], Header) = {
    val f = fs(spark, table)
    val in = f.open(new Path(manifestDir(table), s"v$version.json"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    lines match {
      case headerRe(tagsBody, _, schemaGrp) :: rest =>
        val tags = quotedRe.findAllMatchIn(tagsBody).map(m => unesc(m.group(1))).toSet
        (rest.map(parseEntry), Header(tags, Option(schemaGrp).map(unesc)))
      case _ => (lines.map(parseEntry), Header())
    }
  }

  private[sources] def writeManifest(spark: SparkSession, table: String,
                                     version: Long,
                                     entries: Seq[FileEntry],
                                     hdr: Header = Header()): Unit = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    f.mkdirs(dir)
    val tmp = new Path(dir, s"v$version.json.tmp.${java.util.UUID.randomUUID.toString.take(8)}")
    val header = hdr.tags.toSeq.sorted
      .map(t => "\"" + esc(t) + "\"").mkString("""{"tags":[""", ",", "]") +
      hdr.schema.fold("")(s => s""","schema":"${esc(s)}"""") + "}\n"
    val out = f.create(tmp, false)
    try out.write((header + entries.map(entryJson).mkString("", "\n", "\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val target = new Path(dir, s"v$version.json")
    // THE commit point: rename fails (or the target already exists) iff a
    // concurrent writer published this version first — surface it loudly;
    // the caller re-reads the new current version and retries its commit.
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      sys.error(s"snapshot commit conflict: v$version already published for $table")
    }
  }

  // ---- data-file production

  /** Write `df` as immutable data files under `data/`, exactly one
    * partition value per file (so manifest skipping is exact), and
    * return their manifest entries. Separation comes from the WRITER —
    * `partitionBy` on a duplicate of the partition column — not from a
    * hash repartition, which AQE's partition coalescing would merge at
    * low volume. The duplicate keeps the real column in the row data
    * (snapshot files have no hive layout to re-infer it from);
    * `maxRecordsPerFile` splits a hot value into right-sized files at
    * scale. Partition values must be non-null.
    */
  private def writeDataFiles(spark: SparkSession, table: String, df: DataFrame,
                             partCol: String,
                             namePrefix: Option[String] = None,
                             statsCol: Option[String] = None): Seq[FileEntry] = {
    val f = fs(spark, table)
    // the optional caller prefix TAGS the files (idempotence probes key
    // on it); the uuid keeps retried attempts from colliding on names
    val commit = namePrefix.map(_ + "_").getOrElse("") +
      java.util.UUID.randomUUID.toString.take(8)
    val staging = new Path(table, s"_staging_$commit")
    // repartition before the write: without it every input task emits
    // its own file per value it touches (compaction would fold N files
    // into N), and with it AQE coalesces small inputs into few writer
    // tasks while partitionBy still enforces per-value file separation.
    // With a stats column the repartition is BY RANGE of it — writer
    // tasks then hold disjoint value ranges, so each (task × partition
    // value) file carries a tight min/max and range skipping actually
    // bites; without one, hash by partition value. A hot value
    // serializes into one writer task (maxRecordsPerFile bounds its
    // FILES, not its wall clock) — the standard remedy, salting the
    // repartition key, is the caller's choice at ingest shape.
    val clustered = statsCol match {
      // explicit partition count: a bare repartitionByRange is an
      // AQE-coalescible shuffle, and coalescing the range splits back
      // together leaves every file spanning the whole keyspace — stats
      // that can never skip. The explicit count (REPARTITION_BY_NUM) is
      // exempt from coalescing; callers size shuffle.partitions to the
      // corpus as everywhere else in the repo.
      case Some(sc) => df.repartitionByRange(
        df.sparkSession.sessionState.conf.numShufflePartitions, col(sc))
      case None     => df.repartition(col(partCol))
    }
    clustered.withColumn("__part", col(partCol)).write
      .option("maxRecordsPerFile", 5000000L)
      .partitionBy("__part").parquet(staging.toString)

    // list BEFORE the stats scan: an empty input produced no partition
    // dirs, and spark.read on a file-less staging dir cannot infer a
    // schema — an empty batch (e.g. an empty streaming micro-batch) is
    // a legitimate entries-empty commit, not an error
    val staged = f.listStatus(staging).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__part="))
      .flatMap { dirSt =>
        f.listStatus(dirSt.getPath).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => (dirSt.getPath.getName, st.getPath))
      }
    if (staged.isEmpty) { f.delete(staging, true); return Seq.empty }

    // per-file row counts (+ stats-column min/max): one column-pruned
    // scan of the NEW files (never the table), keyed by
    // (partition dir, file base)
    val statsAggs = count(lit(1)).as("rows") +: statsCol.toSeq.flatMap(sc =>
      Seq(min(col(sc)).cast("double").as("lo"),
        max(col(sc)).cast("double").as("hi")))
    val rows = spark.read.parquet(staging.toString)
      .groupBy(input_file_name().as("f")).agg(statsAggs.head, statsAggs.tail: _*)
      .collect().map { r =>
        val p = new Path(new java.net.URI(r.getString(0)).getPath)
        // an all-null stats column yields null min/max: record no stats
        // for that file (it then never skips) instead of an NPE
        val st = statsCol.flatMap(sc =>
          if (r.isNullAt(2) || r.isNullAt(3)) None
          else Some(ColStats(sc, r.getDouble(2), r.getDouble(3))))
        (p.getParent.getName, p.getName) -> (r.getLong(1), st)
      }.toMap

    f.mkdirs(dataDir(table))
    val entries = staged.zipWithIndex
      .map { case ((dirName, src), i) =>
        val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(dirName.stripPrefix("__part="))
        val dest = new Path(dataDir(table), s"$commit-$i-${src.getName}")
        require(f.rename(src, dest),
          s"snapshot: could not place data file $dest")
        val (n, st) = rows.getOrElse((dirName, src.getName), (0L, None))
        FileEntry(s"data/$commit-$i-${src.getName}", Some(Seq(value)), n, st)
      }
    f.delete(staging, true)
    entries
  }

  private def readFiles(spark: SparkSession, table: String,
                        entries: Seq[FileEntry],
                        schema: Option[String] = None): DataFrame = {
    require(entries.nonEmpty, "snapshot read: empty file set")
    val reader = schema.fold(spark.read)(ddl =>
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl)))
    reader.parquet(entries.map(e => s"$table/${e.path}"): _*)
  }

  // ---- public surface

  /** Create the table with `df` as version 1. With `statsCol`, writes
    * are range-clustered on that column and every file records its
    * min/max for [[readRange]] skipping.
    */
  def create(spark: SparkSession, table: String, df: DataFrame,
             partCol: String, statsCol: Option[String] = None): Long = {
    require(versions(spark, table).isEmpty,
      s"snapshot table $table already exists")
    val entries = writeDataFiles(spark, table, df, partCol,
      statsCol = statsCol)
    writeManifest(spark, table, 1L, entries,
      Header(schema = Some(df.schema.toDDL)))
    1L
  }

  /** Create the table EMPTY at version 1 — the sink bootstrap: with an
    * empty v1 in place, every producer batch (including the first) goes
    * through [[commitAppend]]'s tagged idempotent path, so a retried
    * first batch cannot double-commit the way an untagged `create`
    * would. (An empty table has no schema yet; reads fail until the
    * first append commits.)
    */
  def createEmpty(spark: SparkSession, table: String): Long = {
    require(versions(spark, table).isEmpty,
      s"snapshot table $table already exists")
    writeManifest(spark, table, 1L, Seq.empty)
    1L
  }

  /** Read the current snapshot (resolved once, at call time — the plan
    * stays on those files even if commits land before an action runs).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(spark, table))

  /** Time travel: read an older (still un-vacuumed) snapshot. */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val (entries, hdr) = readManifestFull(spark, table, version)
    readFiles(spark, table, entries, hdr.schema)
  }

  /** Manifest-level file skipping: plan ONLY files whose recorded
    * partition values intersect `values` (a `*` entry always qualifies),
    * with the residual row filter on top.
    */
  def readWhere(spark: SparkSession, table: String, partCol: String,
                values: Seq[String]): DataFrame = {
    val wanted = values.toSet
    // full manifest read for the HEADER too: a pruned read over mixed
    // pre/post-evolution files must apply the recorded table schema, not
    // whatever one surviving footer happens to infer
    val (manifest, hdr) =
      readManifestFull(spark, table, currentVersion(spark, table))
    val hit = manifest.filter(_.parts.forall(_.exists(wanted.contains)))
    if (hit.isEmpty)
      read(spark, table).filter(lit(false)) // schema-preserving empty
    else readFiles(spark, table, hit, hdr.schema)
      .filter(col(partCol).isin(values: _*))
  }

  /** Manifest-stats RANGE skipping: plan only files whose recorded
    * [lo, hi] for `statsCol` intersects [lo, hi] (inclusive). A file
    * without stats — or with stats of a DIFFERENT column — always
    * qualifies, so pruning can only ever drop files proven disjoint.
    * The residual row filter rides on top.
    */
  def readRange(spark: SparkSession, table: String, statsCol: String,
                lo: Double, hi: Double): DataFrame = {
    val (manifest, hdr) =
      readManifestFull(spark, table, currentVersion(spark, table))
    val hit = manifest.filter(_.stats.forall(s =>
      s.col != statsCol || (s.hi >= lo && s.lo <= hi)))
    if (hit.isEmpty)
      read(spark, table).filter(lit(false))
    else readFiles(spark, table, hit, hdr.schema)
      .filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** Snapshot-isolated MERGE: rows of `updates` replace same-key rows,
    * only affected files are rewritten, the rest carry over by
    * reference. Affected = files intersecting the batch's partition
    * values, WIDENED by files still holding a batch key elsewhere
    * (cross-partition movers, detected with one column-pruned scan of
    * the complement — file-granular, so a clean batch rewrites nothing
    * extra). Returns (new version, rows replaced, rows inserted).
    */
  def commitMerge(spark: SparkSession, table: String, updates: DataFrame,
                  keyCol: String, partCol: String): (Long, Long, Long) = {
    val v = currentVersion(spark, table)
    val (manifest, hdr) = readManifestFull(spark, table, v)
    val batchParts = updates.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet

    val (hit0, miss0) = manifest.partition(
      _.parts.forall(_.exists(batchParts.contains)))
    val movers =
      if (miss0.isEmpty) Seq.empty
      else {
        val stale = readFiles(spark, table, miss0, hdr.schema)
          .select(col(keyCol), input_file_name().as("__f"))
          .join(updates.select(col(keyCol)), Seq(keyCol), "left_semi")
          .select(col("__f")).distinct()
          .collect().map(r => new Path(r.getString(0)).getName).toSet
        miss0.filter(e => stale.contains(new Path(e.path).getName))
      }
    val affected = hit0 ++ movers
    val carried = manifest.diff(affected)

    val target =
      if (affected.isEmpty) updates.filter(lit(false))
      else readFiles(spark, table, affected, hdr.schema)
    val merged = target
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(updates.select(target.columns.map(col).toIndexedSeq: _*))
    val fresh = writeDataFiles(spark, table, merged, partCol,
      statsCol = tableStatsCol(manifest))
    writeManifest(spark, table, v + 1, carried ++ fresh, hdr)
    // replaced/inserted by ARITHMETIC, not extra scans: the manifest
    // already records affected-file row counts, writeDataFiles already
    // counted the merged output, and only the (small) batch is counted
    // here — zero additional passes over the table side.
    //   freshRows = targetRows − nReplaced + updCount
    val updCount = updates.count()
    val targetRows = affected.map(_.rows).sum
    val freshRows = fresh.map(_.rows).sum
    val nReplaced = targetRows + updCount - freshRows
    (v + 1, nReplaced, updCount - nReplaced)
  }

  /** Append `df` as a new snapshot version, all current files carried by
    * reference. With a `tag`, the append is IDEMPOTENT on it: the tag
    * joins the manifest header's cumulative committed-tag set, and a
    * call whose tag is already recorded is a no-op returning None — the
    * retry contract a streaming sink needs (a crashed attempt's files
    * are referenced by no manifest: invisible to readers, vacuum food).
    * The record survives [[compact]] renaming the data files, so even a
    * retry delivered after maintenance ran stays a no-op. Returns the
    * new version, or None for a duplicate.
    */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
                   partCol: String, tag: Option[String] = None,
                   statsCol: Option[String] = None): Option[Long] = {
    val v = currentVersion(spark, table)
    val (manifest, hdr) = readManifestFull(spark, table, v)
    if (tag.exists(hdr.tags.contains))
      None
    else {
      val evolved = evolveSchema(hdr.schema, df)
      val fresh = writeDataFiles(spark, table, df, partCol, tag,
        statsCol.orElse(tableStatsCol(manifest)))
      writeManifest(spark, table, v + 1, manifest ++ fresh,
        hdr.copy(tags = hdr.tags ++ tag, schema = Some(evolved)))
      Some(v + 1)
    }
  }

  /** ADD-only schema evolution: the table schema grows by the batch's
    * novel columns; shared names must keep their type. Old files are
    * never rewritten — reads apply the evolved schema and parquet
    * yields null for columns a file predates. A batch may also OMIT
    * existing columns (they read back null for its rows).
    */
  private def evolveSchema(current: Option[String],
                           df: DataFrame): String = current match {
    case None => df.schema.toDDL
    case Some(ddl) =>
      val cur = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      df.schema.foreach { f =>
        cur.find(_.name == f.name).foreach { c =>
          require(c.dataType == f.dataType,
            s"schema evolution: column ${f.name} is ${f.dataType}, table has ${c.dataType}")
        }
      }
      val added = df.schema.filterNot(f => cur.exists(_.name == f.name))
      org.apache.spark.sql.types.StructType(cur ++ added).toDDL
  }

  /** The stats column the table's existing files record (first defined
    * entry) — lets maintenance and follow-on commits keep recording the
    * same stats without the caller re-stating it.
    */
  private def tableStatsCol(manifest: Seq[FileEntry]): Option[String] =
    manifest.flatMap(_.stats).headOption.map(_.col)

  /** Fold the current version's small files (rows < `smallThreshold`)
    * into right-sized ones, publishing the SAME rows as a new version —
    * the steady-state maintenance a micro-batch append sink needs (each
    * batch adds a file per touched partition value; a day of 1-minute
    * batches is ~1 440 tiny files per value). Large files carry over by
    * reference. Returns (new version, files folded, files produced);
    * current version unchanged when fewer than 2 files qualify.
    */
  def compact(spark: SparkSession, table: String, partCol: String,
              smallThreshold: Long = 1000000L): (Long, Int, Int) = {
    val v = currentVersion(spark, table)
    val (manifest, hdr) = readManifestFull(spark, table, v)
    val small = manifest.filter(_.rows < smallThreshold)
    if (small.size < 2) (v, 0, 0)
    else {
      val fresh = writeDataFiles(spark, table,
        readFiles(spark, table, small, hdr.schema), partCol,
        statsCol = tableStatsCol(manifest))
      // the header (tag ledger + schema) rides along — idempotence and
      // the evolved schema both outlive the renames
      writeManifest(spark, table, v + 1, manifest.diff(small) ++ fresh, hdr)
      (v + 1, small.size, fresh.size)
    }
  }

  /** Row-level DELETE: drop rows matching `predicate`, rewriting ONLY
    * files that contain a match and carrying every other file by
    * reference. Candidates come from one column-pruned scan tagging
    * rows with their source file; `rangeHint` lets the caller assert a
    * stats-column bound implied by the predicate, manifest-pruning that
    * scan too. Deletes are snapshot-isolated like every other commit:
    * readers pinned to the old version keep seeing the rows until
    * [[vacuum]]. Returns (new version, rows deleted) — current version
    * unchanged when nothing matches.
    */
  def commitDelete(spark: SparkSession, table: String,
                   predicate: org.apache.spark.sql.Column,
                   partCol: String,
                   rangeHint: Option[(String, Double, Double)] = None): (Long, Long) = {
    val v = currentVersion(spark, table)
    val (manifest, hdr) = readManifestFull(spark, table, v)
    // rangeHint is the caller's ASSERTION that the predicate implies
    // col ∈ [lo, hi]: the candidate scan then skips files whose stats
    // are disjoint (a wrong hint silently misses rows — it narrows the
    // scan, the predicate still decides row membership)
    val scanSet = rangeHint.fold(manifest) { case (c, lo, hi) =>
      manifest.filter(_.stats.forall(s =>
        s.col != c || (s.hi >= lo && s.lo <= hi)))
    }
    if (scanSet.isEmpty) return (v, 0L)
    // three-valued logic: a predicate that evaluates NULL marks a row
    // NON-matching. Without the coalesce, filter(pred) and filter(!pred)
    // BOTH drop the row — null rows in rewritten files would silently
    // vanish while identical rows in untouched files survive.
    val matches = coalesce(predicate, lit(false))
    val hitNames = readFiles(spark, table, scanSet, hdr.schema)
      .withColumn("__f", input_file_name())
      .filter(matches)
      .select(col("__f")).distinct()
      .collect().map(r => new Path(new java.net.URI(r.getString(0)).getPath).getName)
      .toSet
    val affected = manifest.filter(e =>
      hitNames.contains(new Path(e.path).getName))
    if (affected.isEmpty) (v, 0L)
    else {
      val target = readFiles(spark, table, affected, hdr.schema)
      val nDeleted = target.filter(matches).count()
      val kept = target.filter(!matches)
      val fresh =
        if (kept.isEmpty) Seq.empty
        else writeDataFiles(spark, table, kept, partCol,
          statsCol = tableStatsCol(manifest))
      writeManifest(spark, table, v + 1, manifest.diff(affected) ++ fresh, hdr)
      (v + 1, nDeleted)
    }
  }

  /** Remove data files referenced by NO retained manifest and manifests
    * older than the newest `keepVersions`. Orphans from crashed commits
    * (files without a manifest, manifest tmps) go too. Returns files
    * deleted.
    *
    * `minAgeMs` is the reader-protection window: a version stays
    * retained until its SUCCESSOR's manifest is at least that old —
    * a reader can have pinned v_n no later than v_{n+1}'s publish, so
    * after that point plus the window, v_n's files can no longer be in
    * any running scan (the Delta/Iceberg retention-period discipline;
    * size it to the longest query you run). Default 0 keeps the
    * explicit-maintenance behavior.
    */
  def vacuum(spark: SparkSession, table: String, keepVersions: Int = 1,
             minAgeMs: Long = 0L): Long = {
    require(keepVersions >= 1, "vacuum must keep at least the current version")
    val f = fs(spark, table)
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"vacuum: $table has no committed version")
    val cutoff = System.currentTimeMillis() - minAgeMs
    val protectedVs =
      if (minAgeMs <= 0) Seq.empty
      else vs.zip(vs.drop(1)).collect { case (v, next)
        if f.getFileStatus(new Path(manifestDir(table), s"v$next.json"))
          .getModificationTime > cutoff => v
      }
    val keep = (vs.takeRight(keepVersions) ++ protectedVs).distinct.sorted
    val live: Set[String] = keep.flatMap(readManifest(spark, table, _))
      .map(e => new Path(e.path).getName).toSet
    // the age window also protects UNREFERENCED artifacts: a data file,
    // manifest tmp, or staging dir younger than the window may belong to
    // an IN-FLIGHT commit whose manifest is about to publish — deleting
    // it would leave a committed manifest pointing at missing files
    // (the Delta/Iceberg rule: retention applies to data-file age too)
    def oldEnough(st: org.apache.hadoop.fs.FileStatus): Boolean =
      minAgeMs <= 0 || st.getModificationTime <= cutoff
    var deleted = 0L
    if (f.exists(dataDir(table)))
      f.listStatus(dataDir(table)).foreach { st =>
        if (!live.contains(st.getPath.getName) && oldEnough(st)) {
          f.delete(st.getPath, false); deleted += 1
        }
      }
    f.listStatus(manifestDir(table)).foreach { st =>
      st.getPath.getName match {
        case vRe(n) if !keep.contains(n.toLong) =>
          f.delete(st.getPath, false); deleted += 1
        case name if name.contains(".json.tmp.") && oldEnough(st) =>
          f.delete(st.getPath, false); deleted += 1
        case _ => ()
      }
    }
    // crashed writeDataFiles stagings are unreferenced by construction —
    // but a YOUNG one may be a commit mid-write, so the window applies
    f.listStatus(new Path(table)).foreach { st =>
      if (st.getPath.getName.startsWith("_staging_") && oldEnough(st)) {
        f.delete(st.getPath, true); deleted += 1
      }
    }
    deleted
  }

  /** Version history as a DataFrame: one row per retained manifest —
    * (version, n_files, n_rows, n_tags, committed_at). The table's
    * operational describe; at scale this reads K small manifests, never
    * data.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, table)
    versions(spark, table).map { v =>
      val (entries, hdr) = readManifestFull(spark, table, v)
      val mtime = f.getFileStatus(new Path(manifestDir(table), s"v$v.json"))
        .getModificationTime
      (v, entries.size.toLong, entries.map(_.rows).sum,
        hdr.tags.size.toLong,
        new java.sql.Timestamp(mtime))
    }.toDF("version", "n_files", "n_rows", "n_tags", "committed_at")
  }

  // ---- driver queries: the deterministic upsert scenario, run through
  // snapshot commits (same batch as q_upsert_merge; its oracle replays
  // the merge, and time travel replays the PRE-merge table)

  // one scenario per (session, corpus): both driver queries read the same
  // committed table — the create+merge would otherwise run twice per
  // verify/bench pass for no information (PatientPipeline's memo shape).
  // The table is never mutated after the merge commits, so sharing is safe.
  @volatile private var scenarioMemo: Option[((SparkSession, String), String)] = None

  private def scenario(s: SparkSession, dir: String): String =
    scenarioMemo match {
      case Some((k, w)) if k == ((s, dir)) => w
      case _ => synchronized {
        scenarioMemo match {
          case Some((k, w)) if k == ((s, dir)) => w
          case _ =>
            val w = buildScenario(s, dir)
            scenarioMemo = Some(((s, dir), w))
            w
        }
      }
    }

  private def buildScenario(s: SparkSession, dir: String): String = {
    val work = java.nio.file.Files
      .createTempDirectory("graft_snapshot_run").resolve("t").toString
    val orders = Tables.orders(s, dir)
      .select(Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority").map(col): _*)
    create(s, work, orders, "o_orderpriority", statsCol = Some("o_orderkey"))
    val changed = Tables.orders(s, dir).filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val maxKey = Tables.orders(s, dir).agg(max(col("o_orderkey"))).head().getLong(0)
    val fresh = s.range(1, 6).select(
      (col("id") + maxKey).as("o_orderkey"),
      lit(1L).as("o_custkey"),
      lit(123.45).as("o_totalprice"),
      to_timestamp(lit("1999-01-01")).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
    commitMerge(s, work, changed.unionByName(fresh),
      "o_orderkey", "o_orderpriority")
    work
  }

  private def rollup(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderpriority"))

  /** Post-merge rollup from the NEW snapshot (shares the relational
    * merge replay with `q_upsert_merge`'s oracle shape).
    */
  def snapshotMergeQuery(s: SparkSession, dir: String): DataFrame =
    rollup(read(s, scenario(s, dir)))

  /** The SAME table, version 1, read AFTER the merge committed — time
    * travel must reproduce the pre-merge table exactly (oracle: plain
    * rollup of `orders`).
    */
  def timeTravelQuery(s: SparkSession, dir: String): DataFrame =
    rollup(readVersion(s, scenario(s, dir), 1L))

  /** Rollup of a key range read through manifest min/max skipping on
    * the post-merge table — correct only if the pruned plan loses no
    * qualifying row (stats recorded at create must survive the merge
    * rewrite).
    */
  def rangeSkipQuery(s: SparkSession, dir: String): DataFrame =
    rollup(readRange(s, scenario(s, dir), "o_orderkey", 1000d, 3000d))

  // the delete query's PRIVATE base table (it cannot share the merge
  // scenario: a delete commit would advance the version the other
  // queries read) — built once per (session, corpus) and CLONED per
  // invocation, so repeated runs measure the delete (candidate scan +
  // pruned rewrite), not a repeated table build
  @volatile private var deleteBaseMemo: Option[((SparkSession, String), String)] = None

  private def deleteBase(s: SparkSession, dir: String): String =
    deleteBaseMemo match {
      case Some((k, w)) if k == ((s, dir)) => w
      case _ => synchronized {
        deleteBaseMemo match {
          case Some((k, w)) if k == ((s, dir)) => w
          case _ =>
            val work = java.nio.file.Files
              .createTempDirectory("graft_snapshot_delbase").resolve("t").toString
            create(s, work, Tables.orders(s, dir)
              .select(Seq("o_orderkey", "o_custkey", "o_totalprice",
                "o_orderdate", "o_orderpriority").map(col): _*),
              "o_orderpriority", statsCol = Some("o_orderkey"))
            deleteBaseMemo = Some(((s, dir), work))
            work
        }
      }
    }

  /** Copy a committed table's files to a fresh location — immutable
    * files, so a plain recursive copy IS a valid clone at any quiesced
    * version (the sandbox stand-in for an object-store server-side
    * copy; at scale you would time-travel-read the source instead).
    */
  private def cloneTable(s: SparkSession, src: String): String = {
    val dst = java.nio.file.Files
      .createTempDirectory("graft_snapshot_del").resolve("t").toString
    val f = fs(s, src)
    require(org.apache.hadoop.fs.FileUtil.copy(f, new Path(src), f,
      new Path(dst), false, s.sparkContext.hadoopConfiguration),
      s"snapshot clone: could not copy $src")
    dst
  }

  /** Rollup after a row-level DELETE (keys ≡ 0 mod 101 inside a key
    * range) — on a per-run CLONE of the memoized base table.
    * The range-bounded predicate matches the range-clustered layout, so
    * only the files holding the key window are rewritten — a scattered
    * predicate would legitimately rewrite every file.
    */
  def deleteQuery(s: SparkSession, dir: String): DataFrame = {
    val work = cloneTable(s, deleteBase(s, dir))
    commitDelete(s, work,
      col("o_orderkey") % 101 === 0 && col("o_orderkey").between(1000, 5000),
      "o_orderpriority", rangeHint = Some(("o_orderkey", 1000d, 5000d)))
    rollup(read(s, work))
  }

  /** Rollup across a schema-evolving append: v1 has four columns, the
    * appended batch adds `o_bonus` — old files are NOT rewritten, the
    * evolved read yields null bonus for pre-evolution rows, and the
    * per-priority rollup must agree with the relational union replay.
    */
  def evolveQuery(s: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files
      .createTempDirectory("graft_snapshot_evo").resolve("t").toString
    val base = Tables.orders(s, dir)
      .select(Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderpriority").map(col): _*)
    create(s, work, base, "o_orderpriority")
    val extra = Tables.orders(s, dir).filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey") + 10000000L as "o_orderkey",
        col("o_custkey"), col("o_totalprice"), col("o_orderpriority"),
        (col("o_orderkey") * 2).as("o_bonus"))
    commitAppend(s, work, extra, "o_orderpriority")
    read(s, work)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_bonus")).as("n_bonus"),
        sum(coalesce(col("o_bonus"), lit(0L))).as("bonus_sum"))
      .orderBy(col("o_orderpriority"))
  }

  override def queries: Map[String, QueryPack.Q] = Map(
    "q_snapshot_merge" -> (snapshotMergeQuery _),
    "q_time_travel" -> (timeTravelQuery _),
    "q_snapshot_skip" -> (rangeSkipQuery _),
    "q_snapshot_delete" -> (deleteQuery _),
    "q_snapshot_evolve" -> (evolveQuery _))

  override def oracleSql: Map[String, String] = Map(
    "q_snapshot_merge" ->
      """WITH changed AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), fresh AS (
        |  SELECT (SELECT max(o_orderkey) FROM orders) + i AS o_orderkey,
        |    CAST(1 AS BIGINT) AS o_custkey, 123.45 AS o_totalprice,
        |    '1999-01-01' AS o_orderdate, '1-URGENT' AS o_orderpriority
        |  FROM (SELECT unnest(generate_series(1, 5)) AS i)
        |), upd AS (
        |  SELECT * FROM changed UNION ALL SELECT * FROM fresh
        |), merged AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM upd
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_time_travel" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_snapshot_skip" ->
      """WITH changed AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), fresh AS (
        |  SELECT (SELECT max(o_orderkey) FROM orders) + i AS o_orderkey,
        |    CAST(1 AS BIGINT) AS o_custkey, 123.45 AS o_totalprice,
        |    '1999-01-01' AS o_orderdate, '1-URGENT' AS o_orderpriority
        |  FROM (SELECT unnest(generate_series(1, 5)) AS i)
        |), upd AS (
        |  SELECT * FROM changed UNION ALL SELECT * FROM fresh
        |), merged AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM upd
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM merged WHERE o_orderkey BETWEEN 1000 AND 3000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_snapshot_delete" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders
        |WHERE NOT (o_orderkey % 101 = 0 AND o_orderkey BETWEEN 1000 AND 5000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_snapshot_evolve" ->
      """WITH ext AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_orderpriority,
        |    o_orderkey * 2 AS o_bonus
        |  FROM orders WHERE o_orderkey % 50 = 0
        |), unioned AS (
        |  SELECT o_orderkey, o_orderpriority, CAST(NULL AS BIGINT) AS o_bonus
        |  FROM orders
        |  UNION ALL SELECT o_orderkey, o_orderpriority, o_bonus FROM ext
        |)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(o_bonus) AS BIGINT) AS n_bonus,
        |  CAST(sum(COALESCE(o_bonus, 0)) AS BIGINT) AS bonus_sum
        |FROM unioned GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
