package graft.sources

import org.apache.spark.sql.{GraftRegistryBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `[EXT]` SQL surface for snapshot tables — TABLE-VALUED FUNCTIONS, so
  * a SQL-only user reaches the whole lakehouse layer without the Scala
  * API (the published `delta.`/Iceberg SQL-extension shape, done with
  * Spark's native TVF registry instead of a parser extension):
  *
  * {{{
  * SELECT * FROM snapshot_table('/path/to/t')             -- current
  * SELECT * FROM snapshot_table('/path/to/t', 3)          -- time travel
  * SELECT * FROM snapshot_changes('/path/to/t', 1, 4)     -- CDC feed
  * SELECT * FROM snapshot_history('/path/to/t')           -- describe
  * SELECT * FROM snapshot_files('/path/to/t')             -- files meta
  * }}}
  *
  * The TVF resolves to the SAME relation the Scala API plans
  * ([[SnapshotFileIndex]]-backed), so WHERE predicates on a
  * `snapshot_table` scan push down into manifest file skipping like
  * any other filter. Registered per session via [[register]], or for
  * every session through `spark.sql.extensions=graft.GraftExtensions`
  * (both paths share [[tvfs]]).
  *
  * Arguments must be literals — these functions pin a table/version at
  * ANALYSIS time (exactly the snapshot-isolation contract: the plan
  * stays on those files however long the query runs).
  */
object SnapshotSql {

  private def strArg(fn: String, exprs: Seq[Expression], i: Int): String =
    exprs(i) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def longArg(fn: String, exprs: Seq[Expression], i: Int): Long =
    exprs(i) match {
      case Literal(v: java.lang.Integer, IntegerType) => v.toLong
      case Literal(v: java.lang.Long, LongType)       => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  /** (name, info, builder) triples — shared by [[register]] and
    * [[graft.GraftExtensions]].
    */
  def tvfs: Seq[(String, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    ("snapshot_table",
      new ExpressionInfo(getClass.getName, null, "snapshot_table",
        "_FUNC_(path[, version]) - read a snapshot table at its current " +
          "(or a pinned) version; predicates push down into manifest " +
          "file skipping",
        "_FUNC_(string[, bigint])"),
      (exprs: Seq[Expression]) => {
        val spark = SparkSession.active
        val path = strArg("snapshot_table", exprs, 0)
        val df = exprs.length match {
          case 1 => SnapshotTable.read(spark, path)
          case 2 => SnapshotTable.readVersion(spark, path,
            longArg("snapshot_table", exprs, 1))
          case n => throw new IllegalArgumentException(
            s"snapshot_table: expected 1 or 2 arguments, got $n")
        }
        df.queryExecution.logical
      }),
    ("snapshot_changes",
      new ExpressionInfo(getClass.getName, null, "snapshot_changes",
        "_FUNC_(path, from_version, to_version) - row-level change feed " +
          "committed in (from, to]: data columns plus _change_type " +
          "(insert|delete) and _commit_version",
        "_FUNC_(string, bigint, bigint)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"snapshot_changes: expected 3 arguments, got ${exprs.length}")
        val spark = SparkSession.active
        SnapshotTable.readChangesBetween(spark,
          strArg("snapshot_changes", exprs, 0),
          longArg("snapshot_changes", exprs, 1),
          longArg("snapshot_changes", exprs, 2))
          .queryExecution.logical
      }),
    ("catalog_table",
      new ExpressionInfo(getClass.getName, null, "catalog_table",
        "_FUNC_(root, name[, catalog_version]) - resolve a table " +
          "through the versioned catalog and read its PINNED version; " +
          "two catalog_table reads at the same catalog version are " +
          "cross-table consistent",
        "_FUNC_(string, string[, bigint])"),
      (exprs: Seq[Expression]) => {
        val spark = SparkSession.active
        val root = strArg("catalog_table", exprs, 0)
        val name = strArg("catalog_table", exprs, 1)
        val df = exprs.length match {
          case 2 => SnapshotCatalog.read(spark, root, name)
          case 3 => SnapshotCatalog.read(spark, root, name,
            Some(longArg("catalog_table", exprs, 2)))
          case n => throw new IllegalArgumentException(
            s"catalog_table: expected 2 or 3 arguments, got $n")
        }
        df.queryExecution.logical
      }),
    ("snapshot_history",
      new ExpressionInfo(getClass.getName, null, "snapshot_history",
        "_FUNC_(path) - one row per retained version: (version, n_files, " +
          "n_rows, n_tags, committed_at); reads only manifest lists",
        "_FUNC_(string)"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"snapshot_history: expected 1 argument, got ${exprs.length}")
        SnapshotTable.history(SparkSession.active,
          strArg("snapshot_history", exprs, 0)).queryExecution.logical
      }),
    ("snapshot_files",
      new ExpressionInfo(getClass.getName, null, "snapshot_files",
        "_FUNC_(path[, version]) - the files inspection table: one row " +
          "per data file with partition stamp, row/byte counts, commit " +
          "seq, and stat/bloom columns; zero data-file reads",
        "_FUNC_(string[, bigint])"),
      (exprs: Seq[Expression]) => {
        val spark = SparkSession.active
        val path = strArg("snapshot_files", exprs, 0)
        val df = exprs.length match {
          case 1 => SnapshotTable.filesTable(spark, path)
          case 2 => SnapshotTable.filesTable(spark, path,
            Some(longArg("snapshot_files", exprs, 1)))
          case n => throw new IllegalArgumentException(
            s"snapshot_files: expected 1 or 2 arguments, got $n")
        }
        df.queryExecution.logical
      }),
    ("snapshot_stats",
      new ExpressionInfo(getClass.getName, null, "snapshot_stats",
        "_FUNC_(path[, col]) - per-version physical profile from " +
          "manifests only: (version, n_files, n_rows, n_bytes, " +
          "n_delete_files, min_val, max_val, n_nulls); with a column " +
          "argument the bounds/null cells fill where provable, SQL " +
          "NULL otherwise; zero data-file reads",
        "_FUNC_(string[, string])"),
      (exprs: Seq[Expression]) => {
        val spark = SparkSession.active
        val path = strArg("snapshot_stats", exprs, 0)
        val df = exprs.length match {
          case 1 => SnapshotTable.statsHistory(spark, path)
          case 2 => SnapshotTable.statsHistory(spark, path,
            Some(strArg("snapshot_stats", exprs, 1)))
          case n => throw new IllegalArgumentException(
            s"snapshot_stats: expected 1 or 2 arguments, got $n")
        }
        df.queryExecution.logical
      }))

  /** Imperative per-session registration (idempotent — re-registering
    * replaces the previous builder).
    */
  def register(spark: SparkSession): Unit =
    tvfs.foreach { case (name, info, builder) =>
      GraftRegistryBridge.registerTableFunction(spark, name, info, builder)
    }
}
