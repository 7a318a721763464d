package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotTable.{ColStats, FileEntry}

/** `[EXT]` Catalyst-integrated planning for snapshot tables — a
  * [[FileIndex]] that serves ONE pinned manifest's file entries to
  * Spark's `HadoopFsRelation` scan machinery, the published
  * Delta-Lake construction (`TahoeFileIndex`: the log, not the file
  * system, is the source of truth for listing). What it buys over the
  * explicit-path `spark.read.parquet(files…)` read:
  *
  *   - '''Catalyst-driven data skipping.''' `FileSourceScanExec` hands
  *     its pushed-down data filters to [[listFiles]]; every filter is
  *     tested against the manifest's per-file min/max stats and
  *     partition values, and files PROVEN disjoint are never planned.
  *     A plain `df.filter($"ts" > x)` now skips files — no bespoke
  *     `readRange` call required — and the skipping composes with
  *     whatever residual predicate Catalyst keeps, parquet row-group
  *     pushdown, column pruning, and whole-stage codegen, because the
  *     scan IS the standard parquet scan.
  *   - '''RPC-free planning.''' File sizes ride the manifest
  *     ([[SnapshotTable.FileEntry.bytes]]), so split planning needs no
  *     per-file `getFileStatus` — at 100 TB / 100k files the driver
  *     plans from one manifest read instead of 100k namenode/object
  *     store calls. (Entries from pre-`bytes` manifests are statted
  *     once, lazily, per index.)
  *
  * Pruning is CONSERVATIVE three-valued logic: `mayMatch` returns
  * false only when the stats prove no row of the file can satisfy the
  * filter; any shape it does not understand (casts, UDFs, IsNull —
  * stats record no null counts) keeps the file. Wrong answers are
  * impossible; unsupported shapes just read more.
  */
final class SnapshotFileIndex(
    @transient private val spark: SparkSession,
    table: String,
    entries: Seq[FileEntry],
    partCol: Option[String]) extends FileIndex {

  /** The pinned manifest entries this index serves — the hook
    * [[graft.plans.MetadataAggPushdown]] uses to answer whole-table
    * `count`/`min`/`max` from per-file row counts and stats without
    * planning a single data file. Exactly the files a scan of this
    * relation would read, so the rewrite is consistent by construction
    * (a masked read — pending deletes — never exposes a bare relation,
    * and a pruned read prunes these same entries).
    */
  private[graft] def fileEntries: Seq[FileEntry] = entries

  /** The table root this index serves — the hook rewrite rules
    * ([[graft.plans.MviewRewrite]]) use to recognise "a scan of
    * snapshot table X" in a logical plan.
    */
  private[graft] def tablePath: String = table

  /** The table's default partition column — the hook
    * [[graft.plans.RankTopK]]'s filtered path uses to prove a
    * partition-equality conjunct keeps WHOLE files.
    */
  private[graft] def defaultPartCol: Option[String] = partCol

  private val tableRoot = new Path(table)

  // resolve (entry, status) once; synthetic FileStatus from manifest
  // bytes (mtime 0 — only the optional _metadata column would see it)
  @transient private lazy val statuses: Seq[(FileEntry, FileStatus)] = {
    lazy val f = tableRoot.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    entries.map { e =>
      val p = new Path(tableRoot, e.path)
      val st =
        if (e.bytes > 0L) new FileStatus(e.bytes, false, 1, 134217728L, 0L, p)
        else f.getFileStatus(p)
      (e, st)
    }
  }

  override def rootPaths: Seq[Path] = Seq(tableRoot)

  // partition values live IN the rows (no hive dirs), so the relation
  // has no partition schema; all pruning arrives as DATA filters
  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // with an empty partitionSchema the only "partition" filters Spark
    // can route here are reference-free ones (a constant-folded or
    // injected `false` — DynamicPrune's empty-build proof); they prune
    // like any data filter
    val preds = partitionFilters ++ dataFilters
    val kept = statuses.filter { case (e, _) =>
      preds.forall(mayMatch(_, e))
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(s => FileStatusWithMetadata(s._2))))
  }

  // ---- conservative per-file predicate evaluation

  private def stats(e: FileEntry, name: String): Option[ColStats] =
    e.stats.find(_.col == name)

  /** Literal → the double domain the stats writer used
    * (`cast("double")`: numerics natively, timestamps as epoch
    * seconds). Shapes the writer cannot have recorded stats for
    * return None and never prune.
    */
  private def litDouble(l: Literal): Option[Double] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType =>
        Some(l.value.asInstanceOf[java.lang.Number].doubleValue())
      case _: DecimalType => Some(l.value.asInstanceOf[Decimal].toDouble)
      case TimestampType | TimestampNTZType =>
        Some(l.value.asInstanceOf[java.lang.Long].toDouble / 1e6)
      case _ => None
    }

  /** Literal → the partition-value STRING the writer rendered into the
    * `__part=` directory name (strings verbatim; integral types via
    * toString). Other types: None, never prune.
    */
  private def litPart(l: Literal): Option[String] = (l.value, l.dataType) match {
    case (null, _)                   => None
    case (v: UTF8String, StringType) => Some(v.toString)
    case (v: java.lang.Integer, _)   => Some(v.toString)
    case (v: java.lang.Long, _)      => Some(v.toString)
    case (v: java.lang.Short, _)     => Some(v.toString)
    case (v: java.lang.Byte, _)      => Some(v.toString)
    case _                           => None
  }

  // per-entry: under partition evolution a file's recorded values may
  // belong to an older layout's column — only its own stamp (or the
  // table default for pre-stamp manifests) may prune on it
  private def isPart(e: FileEntry, name: String): Boolean =
    e.effPartCol(partCol).contains(name)

  /** Bloom probe for equality: positions come from the SAME XxHash64
    * expression the writer aggregated with, evaluated driver-side on
    * the pushed literal — a "no" is exact (only proven-absent files
    * skip); files without a bloom for the column never skip on it.
    */
  private def bloomMay(e: FileEntry, name: String, v: Literal): Boolean =
    e.blooms.find(_.col == name).forall { b =>
      v.value == null || b.mightContain((0 until b.kHashes).map { i =>
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(v, Literal(i)), 42L).eval(InternalRow.empty)
          .asInstanceOf[Long]
        (((h % b.mBits) + b.mBits) % b.mBits).toInt
      })
    }

  /** May a row of `e` satisfy `x OP v`? False only on stats/partition
    * proof of disjointness.
    */
  private def cmpMay(e: FileEntry, name: String, v: Literal,
                     op: String): Boolean = {
    val statOk = (stats(e, name), litDouble(v)) match {
      // a PROVEN all-null column (null count == rows, recorded with NaN
      // bounds) satisfies no comparison — every predicate on it is
      // UNKNOWN and the filter drops the row, so the file skips exactly
      case (Some(s), _)
          if s.nulls >= 0L && e.rows > 0L && s.nulls == e.rows => false
      // a NaN endpoint (float/double column containing NaN — Spark's
      // min/max order NaN greatest) makes every comparison false, which
      // would wrongly PRUNE; treat such stats as absent instead
      case (Some(s), _) if s.lo.isNaN || s.hi.isNaN => true
      case (Some(s), Some(d)) => op match {
        case "="  => s.lo <= d && d <= s.hi
        case ">"  => s.hi > d
        case ">=" => s.hi >= d
        case "<"  => s.lo < d
        case "<=" => s.lo <= d
        case _    => true
      }
      case _ => true
    }
    // equality on the partition column additionally checks the file's
    // recorded partition values (exact, works for string columns where
    // min/max stats are never recorded)
    val partOk =
      if (op != "=" || !isPart(e, name)) true
      else (e.parts, litPart(v)) match {
        case (Some(ps), Some(s)) => ps.contains(s)
        case _                   => true
      }
    statOk && partOk && (op != "=" || bloomMay(e, name, v))
  }

  private def mayMatch(p: Expression, e: FileEntry): Boolean = p match {
    case And(l, r) => mayMatch(l, e) && mayMatch(r, e)
    case Or(l, r)  => mayMatch(l, e) || mayMatch(r, e)

    // a constant FALSE (or NULL) predicate passes no row of any file —
    // the shape a proven-empty dynamic filter injects
    case Literal(v, BooleanType) if v == null || v == false => false

    case EqualTo(a: AttributeReference, v: Literal) => cmpMay(e, a.name, v, "=")
    case EqualTo(v: Literal, a: AttributeReference) => cmpMay(e, a.name, v, "=")
    // `col <=> NULL` matches exactly the NULL rows — cmpMay's all-null
    // guard would wrongly prune a proven all-null file whose EVERY row
    // matches; it is IsNull semantically, route it there (optimizers
    // usually rewrite it first, but the shape is accepted here, so it
    // must be handled correctly, not one rule-change from a wrong prune)
    case EqualNullSafe(a: AttributeReference, Literal(null, _)) =>
      mayMatch(IsNull(a), e)
    case EqualNullSafe(Literal(null, _), a: AttributeReference) =>
      mayMatch(IsNull(a), e)
    case EqualNullSafe(a: AttributeReference, v: Literal) => cmpMay(e, a.name, v, "=")
    case EqualNullSafe(v: Literal, a: AttributeReference) => cmpMay(e, a.name, v, "=")

    case GreaterThan(a: AttributeReference, v: Literal)        => cmpMay(e, a.name, v, ">")
    case GreaterThan(v: Literal, a: AttributeReference)        => cmpMay(e, a.name, v, "<")
    case GreaterThanOrEqual(a: AttributeReference, v: Literal) => cmpMay(e, a.name, v, ">=")
    case GreaterThanOrEqual(v: Literal, a: AttributeReference) => cmpMay(e, a.name, v, "<=")
    case LessThan(a: AttributeReference, v: Literal)           => cmpMay(e, a.name, v, "<")
    case LessThan(v: Literal, a: AttributeReference)           => cmpMay(e, a.name, v, ">")
    case LessThanOrEqual(a: AttributeReference, v: Literal)    => cmpMay(e, a.name, v, "<=")
    case LessThanOrEqual(v: Literal, a: AttributeReference)    => cmpMay(e, a.name, v, ">=")

    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => cmpMay(e, a.name, v.asInstanceOf[Literal], "="))
    case InSet(a: AttributeReference, hset) =>
      hset.exists(v => cmpMay(e, a.name,
        Literal.create(v, a.dataType), "="))

    // null-count skipping: stats entries record the file's exact null
    // count for each stats column (−1 = legacy entry, never skipped) —
    // IS NOT NULL drops proven all-null files, IS NULL drops proven
    // null-free files
    case IsNotNull(a: AttributeReference) => stats(e, a.name) match {
      case Some(s) if s.nulls >= 0L && e.rows > 0L && s.nulls == e.rows =>
        false
      case _ => true
    }
    case IsNull(a: AttributeReference) => stats(e, a.name) match {
      case Some(s) if s.nulls == 0L && e.rows > 0L => false
      case _                                       => true
    }
    case _: IsNull | _: IsNotNull => true

    // transform-aware skipping: f(col) OP lit where f is a chain of
    // known NON-DECREASING steps (year, date_trunc, ordered casts,
    // floor/ceil, ± literal) — then f([lo,hi]) = [f(lo),f(hi)] bounds
    // the file and the comparison happens in f's OUTPUT domain
    case EqualTo(Mono(f, a), v: Literal) => monoMay(e, f, a, v, "=")
    case EqualTo(v: Literal, Mono(f, a)) => monoMay(e, f, a, v, "=")
    case GreaterThan(Mono(f, a), v: Literal)        => monoMay(e, f, a, v, ">")
    case GreaterThan(v: Literal, Mono(f, a))        => monoMay(e, f, a, v, "<")
    case GreaterThanOrEqual(Mono(f, a), v: Literal) => monoMay(e, f, a, v, ">=")
    case GreaterThanOrEqual(v: Literal, Mono(f, a)) => monoMay(e, f, a, v, "<=")
    case LessThan(Mono(f, a), v: Literal)           => monoMay(e, f, a, v, "<")
    case LessThan(v: Literal, Mono(f, a))           => monoMay(e, f, a, v, ">")
    case LessThanOrEqual(Mono(f, a), v: Literal)    => monoMay(e, f, a, v, "<=")
    case LessThanOrEqual(v: Literal, Mono(f, a))    => monoMay(e, f, a, v, ">=")
    case In(Mono(f, a), vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => monoMay(e, f, a, v.asInstanceOf[Literal], "="))

    case Not(inner) => inner match {
      // single-valued files (the writer's invariant) make negated
      // partition equality exact: every row has the recorded value
      case EqualTo(a: AttributeReference, v: Literal)
          if isPart(e, a.name) =>
        (e.parts, litPart(v)) match {
          case (Some(Seq(only)), Some(s)) => only != s
          case _                          => true
        }
      // NOT(p <=> g) — WindowTopK's null-safe group selector. Prunes
      // (returns false) only when every row provably equals g: a
      // single non-default stamp that renders equal to the literal.
      // Default-stamp files hold NULL/empty-string rows, which are
      // never provably <=> a literal — conservative true.
      case EqualNullSafe(a: AttributeReference, v: Literal)
          if isPart(e, a.name) =>
        (e.parts, litPart(v)) match {
          case (Some(Seq(only)), Some(s))
              if only != "__HIVE_DEFAULT_PARTITION__" => only != s
          case _ => true
        }
      case _ => true
    }

    case _ => true
  }

  override def toString: String =
    s"SnapshotFileIndex($table, ${entries.size} files)"

  // ---- monotone-transform skipping -----------------------------------
  //
  // The Iceberg "transform-aware predicates" idea: for a NON-DECREASING
  // f, the image of the file's [lo, hi] under f is [f(lo), f(hi)], so
  // `f(col) OP literal` prunes by evaluating f driver-side at the two
  // stat endpoints — `year(ts) = 1995` or `cast(ts as date) >= d` skips
  // files without the user rewriting the predicate onto the raw column.
  // Conservativeness: endpoints are reconstructed from the stats'
  // double encoding EXACTLY for integrals under 2^53 and WIDENED by
  // 1 ms for timestamps (absorbing the micros→double→micros round
  // trip); any eval that fails, overflows to null, or lands outside
  // the whitelist keeps the file.

  /** The base column under a chain of known non-decreasing unary steps
    * (a bare column is not a "transform" — it takes the exact path).
    */
  private object Mono {
    def unapply(e: Expression): Option[(Expression, AttributeReference)] =
      e match {
        case _: AttributeReference => None
        case MonoBase(a) => Some((e, a))
        case _ => None
      }
  }

  private def orderedType(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private object MonoBase {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Year(MonoBase(a)) => Some(a)
      // date_trunc / trunc: any truncation is non-decreasing (unit must
      // be literal so f is a function of the column alone)
      case TruncTimestamp(Literal(_, _), MonoBase(a), _) => Some(a)
      case TruncDate(MonoBase(a), Literal(_, _)) => Some(a)
      case c @ Cast(MonoBase(a), _, _, _)
          if orderedType(c.child.dataType) && orderedType(c.dataType) =>
        Some(a)
      case Floor(MonoBase(a)) => Some(a)
      case Ceil(MonoBase(a)) => Some(a)
      case Add(MonoBase(a), _: Literal, _) => Some(a)
      case Add(_: Literal, MonoBase(a), _) => Some(a)
      case Subtract(MonoBase(a), _: Literal, _) => Some(a)
      case _ => None
    }
  }

  /** A typed literal carrying the stat endpoint back in the COLUMN's
    * domain — exact for integrals (refusing doubles past 2^53, where
    * the stats encoding is lossy), ±1 ms widened for timestamps, None
    * (never prune) for types the stats writer cannot round-trip.
    */
  private def statLiteral(a: AttributeReference, d: Double,
                          down: Boolean): Option[Literal] = a.dataType match {
    case TimestampType | TimestampNTZType =>
      val eps = 1000L
      val micros = math.rint(d * 1e6).toLong + (if (down) -eps else eps)
      Some(Literal(micros, a.dataType))
    case ByteType | ShortType | IntegerType | LongType =>
      if (math.abs(d) > 9007199254740992d) None
      else {
        val v = math.rint(d).toLong
        val boxed: Any = a.dataType match {
          case ByteType    => v.toByte
          case ShortType   => v.toShort
          case IntegerType => v.toInt
          case LongType    => v
        }
        Some(Literal.create(boxed, a.dataType))
      }
    case DoubleType => Some(Literal(d, DoubleType))
    case FloatType  => Some(Literal(d.toFloat, FloatType))
    case _ => None
  }

  /** Value of an ORDERED type → the shared comparison domain (the same
    * double encoding the stats writer uses; dates as epoch days).
    */
  private def orderedDouble(value: Any, dt: DataType): Option[Double] =
    if (value == null) None
    else dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType =>
        Some(value.asInstanceOf[java.lang.Number].doubleValue())
      case _: DecimalType => Some(value.asInstanceOf[Decimal].toDouble)
      case TimestampType | TimestampNTZType =>
        Some(value.asInstanceOf[java.lang.Long].toDouble / 1e6)
      case DateType => Some(value.asInstanceOf[java.lang.Integer].toDouble)
      case _ => None
    }

  /** f evaluated at one reconstructed endpoint, in the output domain.
    * Any failure (overflow null, ANSI throw, unsupported output type)
    * → None → the caller keeps the file.
    */
  private def evalAt(f: Expression, a: AttributeReference,
                     end: Literal): Option[Double] =
    try {
      val sub = f.transform {
        case x: AttributeReference if x.exprId == a.exprId => end
      }
      orderedDouble(sub.eval(InternalRow.empty), f.dataType)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** May a row of `e` satisfy `f(col) OP v`? False only when the
    * transformed stat interval provably misses the literal.
    */
  private def monoMay(e: FileEntry, f: Expression, a: AttributeReference,
                      v: Literal, op: String): Boolean = {
    val verdict = for {
      s   <- stats(e, a.name)
      if !s.lo.isNaN && !s.hi.isNaN // NaN endpoints: treat as no stats
      d   <- orderedDouble(v.value, v.dataType)
      lo  <- statLiteral(a, s.lo, down = true)
      hi  <- statLiteral(a, s.hi, down = false)
      flo <- evalAt(f, a, lo)
      fhi <- evalAt(f, a, hi)
    } yield op match {
      case "="  => flo <= d && d <= fhi
      case ">"  => fhi > d
      case ">=" => fhi >= d
      case "<"  => flo < d
      case "<=" => flo <= d
      case _    => true
    }
    verdict.getOrElse(true)
  }
}
