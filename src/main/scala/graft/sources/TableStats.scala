package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `[EXT]` Table-level column statistics for snapshot tables: mergeable
  * KMV ("k minimum values") distinct sketches kept in a `_stats/`
  * sidecar next to the manifests — the published Iceberg-Puffin /
  * theta-sketch construction with an EXACT regime.
  *
  * A KMV sketch over a column keeps the `k` smallest `xxhash64` values
  * (unsigned order) of the column's distinct non-null values. While the
  * sketch never overflowed (`sat = false`) it IS the complete distinct
  * hash set, so the distinct count is exact (64-bit collisions aside —
  * odds ~n²/2⁶⁵); once saturated it degrades to the standard KMV
  * estimator `(k−1)/h₍k₎` with relative error ≈ 1/√(k−2). Sketches
  * MERGE (union, re-truncate to k) — so maintenance is incremental:
  *
  *  - [[analyze]] computes sketches for the CURRENT version with one
  *    distinct-shuffle + top-k per column (TakeOrderedAndProject — the
  *    k+1 smallest hashes cross the wire, never the value set);
  *  - [[refresh]] advances them at DELTA cost when every commit since
  *    the analyzed version only ADDED files (append/merge-insert
  *    windows): sketch the fresh files, merge. Removed files or
  *    equality-delete changes force a recompute — a sketch cannot
  *    subtract.
  *
  * The sidecar records the analyzed version plus a FINGERPRINT of the
  * data-file and delete lists, so a consumer can prove the sketches
  * describe exactly the relation it is reading:
  * [[graft.plans.MetadataAggPushdown]] folds `count(DISTINCT col)`
  * to a metadata answer only when the fingerprint matches the planned
  * file set and the sketch is in its exact regime — never an estimate
  * in disguise. Estimates are served explicitly via [[estimateDistinct]].
  *
  * At 100 TB: ANALYZE is one pass (rare); per-commit maintenance
  * touches only fresh files; the sidecar is O(k · columns) bytes; and
  * NDV is the statistic that decides broadcast-vs-shuffle joins, so
  * keeping it fresh from metadata — not a scan — is the difference
  * between a planner that knows and one that guesses.
  */
object TableStats {

  /** One column's sketch. `minima` is sorted in UNSIGNED hash order;
    * `sat = false` means it is the COMPLETE distinct hash set.
    */
  final case class NdvSketch(col: String, k: Int, sat: Boolean,
                             minima: Array[Long]) {
    /** Exact distinct count, when provable. */
    def exact: Option[Long] = if (!sat) Some(minima.length.toLong) else None

    /** KMV estimate (exact value in the exact regime). */
    def estimate: Double =
      if (!sat) minima.length.toDouble
      else (k - 1).toDouble / unsignedFraction(minima.last)
  }

  /** One column's EXACT sum: decimal arithmetic over the column's
    * non-null values (recorded for INTEGRAL and DECIMAL columns, where
    * decimal(38, s) addition is exact and order-free while it fits —
    * an overflowing ANALYZE refuses loudly rather than recording a
    * lie), plus the non-null row count (decides the SQL-NULL sum and
    * serves `avg`). The BigDecimal carries the column's SCALE (0 for
    * integrals — money columns keep their cents). Sums are ADDITIVE,
    * so the delta [[refresh]] is exact — no budget, unlike the rank
    * tier.
    */
  final case class ColSum(col: String, sum: java.math.BigDecimal,
                          nonNull: Long)

  /** One column's exact sums PER PARTITION VALUE (the partition
    * column's values rendered as strings — the same rendering the
    * manifest stamps use for the servable types): the "revenue per
    * day" operational profile as O(partitions) sidecar metadata.
    * Keyed by VALUE, not by file stamp, so partition evolution cannot
    * corrupt it — a value's sum is a property of the rows, wherever
    * they live. NULL partition values are excluded (the grouped fold
    * never serves the default-stamp group). Additive per (col, value)
    * ⇒ the delta [[refresh]] stays exact.
    */
  final case class GroupSum(col: String, partCol: String,
                            groups: Seq[(String, java.math.BigDecimal, Long)])

  /** Sidecar payload: sketches (and optional exact column sums) valid
    * for the table state identified by (`version`, `filesFp`, `delFp`).
    */
  final case class StatsFile(version: Long, filesFp: String, delFp: String,
                             sketches: Seq[NdvSketch],
                             sums: Seq[ColSum] = Seq.empty,
                             groupSums: Seq[GroupSum] = Seq.empty)

  private def unsignedFraction(h: Long): Double =
    (java.lang.Double.parseDouble(java.lang.Long.toUnsignedString(h)) + 1.0) /
      1.8446744073709552e19 // 2^64

  private def unsignedSort(xs: Array[Long]): Array[Long] =
    xs.map(_ ^ Long.MinValue).sorted.map(_ ^ Long.MinValue)

  /** Compute one column's sketch with a distributed distinct + top-k:
    * the plan is partial-dedup → shuffle on the hash → global dedup →
    * TakeOrdered(k+1) — only k+1 longs reach the driver.
    */
  def sketchOf(df: DataFrame, column: String, k: Int): NdvSketch = {
    val hs = df.select(xxhash64(col(column)).as("h"))
      .where(col(column).isNotNull)
      .distinct()
      .orderBy(col("h").bitwiseXOR(lit(Long.MinValue)))
      .limit(k + 1)
      .collect().map(_.getLong(0))
    val sat = hs.length > k
    NdvSketch(column, k, sat, unsignedSort(if (sat) hs.take(k) else hs))
  }

  /** Mutable bounded distinct-minima buffer for [[KmvAgg]]: keeps (at
    * most) the `cap` smallest DISTINCT hashes in unsigned order,
    * amortized O(1) per insert — values accumulate raw into a 2·cap
    * array and a sort-unique-truncate compaction runs when it fills.
    * Once `cap` distinct minima are held, the running unsigned bound
    * rejects non-improving hashes without touching the array.
    */
  private[sources] final class KmvBuf(val cap: Int) extends Serializable {
    private var arr = new Array[Long](math.max(8, cap * 2))
    private var n = 0
    private var bound = 0L          // flipped-space exclusive bound
    private var hasBound = false
    @inline private def flip(x: Long) = x ^ Long.MinValue

    def insert(h: Long): Unit = {
      if (hasBound && flip(h) >= bound) return
      if (n == arr.length) compact()
      if (hasBound && flip(h) >= bound) return
      arr(n) = h; n += 1
    }

    private def compact(): Unit = {
      val s = java.util.Arrays.stream(arr, 0, n).map(_ ^ Long.MinValue)
        .sorted().distinct().toArray
      val keep = math.min(cap, s.length)
      var i = 0
      while (i < keep) { arr(i) = s(i) ^ Long.MinValue; i += 1 }
      n = keep
      if (s.length >= cap) { bound = s(cap - 1); hasBound = true }
    }

    def absorb(other: KmvBuf): KmvBuf = {
      other.compact()
      var i = 0
      while (i < other.n) { insert(other.arr(i)); i += 1 }
      this
    }

    /** Sorted-unique (unsigned order) raw hashes, ≤ cap of them. */
    def result: Array[Long] = { compact(); arr.take(n) }
  }

  /** The bounded-minima KMV aggregate as a typed [[Aggregator]]: a
    * NULL input (the caller null-gates `xxhash64`, which never returns
    * null itself) contributes nothing. Registered through
    * `functions.udaf`, it plans as an ObjectHashAggregate whose
    * per-partition partial is ≤ k+1 longs — no distinct shuffle of the
    * value set at all, and MANY columns' sketches ride ONE job.
    */
  private final class KmvAgg(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, KmvBuf, Array[Long]] {
    override def zero: KmvBuf = new KmvBuf(cap)
    override def reduce(b: KmvBuf, h: java.lang.Long): KmvBuf = {
      if (h != null) b.insert(h.longValue()); b
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = a.absorb(b)
    override def finish(b: KmvBuf): Array[Long] = b.result
    override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.kryo[KmvBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** ALL of `cols`' sketches and ALL of `sumCols`' exact sums in ONE
    * aggregation job — the maintenance-tick shape ([[analyze]] and the
    * delta [[refresh]] both ride it): where [[sketchOf]] pays a
    * distinct-shuffle + top-k JOB per column, this plans a single
    * ObjectHashAggregate whose per-partition partial carries ≤ k+1
    * hashes per sketch column plus one decimal per sum column. At
    * commit cadence (a stats refresh per janitor tick) the per-tick
    * cost is one pass over the fresh files, however many columns the
    * sidecar tracks; at 100 TB the same fusion keeps ANALYZE a single
    * table pass instead of one per column.
    */
  private[sources] def sketchesAndSums(df: DataFrame, cols: Seq[String],
                                       k: Int, sumCols: Seq[String])
      : (Seq[NdvSketch], Seq[ColSum]) = {
    if (cols.isEmpty) return (Seq.empty, sumsOf(df, sumCols))
    val kmv = org.apache.spark.sql.functions.udaf(new KmvAgg(k + 1))
    val sketchAggs = cols.map(c =>
      kmv(when(col(c).isNotNull, xxhash64(col(c)))).as(s"kmv_$c"))
    val sumAggs = sumCols.flatMap(c => Seq(
      sum(col(c).cast(sumCastType(df, c))).as(s"s_$c"),
      count(col(c)).as(s"n_$c")))
    val aggs = sketchAggs ++ sumAggs
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val sketches = cols.zipWithIndex.map { case (c, i) =>
      val hs = r.getSeq[Long](i).toArray
      val sat = hs.length > k
      NdvSketch(c, k, sat, if (sat) hs.take(k) else hs)
    }
    val base = cols.length
    val sums = sumCols.zipWithIndex.map { case (c, i) =>
      val nn = r.getLong(base + 2 * i + 1)
      require(!r.isNullAt(base + 2 * i) || nn == 0L,
        s"table stats: decimal overflow summing $c")
      val s = if (r.isNullAt(base + 2 * i)) java.math.BigDecimal.ZERO
        else r.getDecimal(base + 2 * i)
      ColSum(c, s, nn)
    }
    (sketches, sums)
  }

  /** KMV union-merge: valid for any two sketches of the same (col, k);
    * exact iff both inputs were exact and the union still fits.
    */
  def merge(a: NdvSketch, b: NdvSketch): NdvSketch = {
    require(a.col == b.col && a.k == b.k,
      s"ndv merge: mismatched sketches (${a.col}/${a.k} vs ${b.col}/${b.k})")
    val u = unsignedSort((a.minima ++ b.minima).distinct)
    if (!a.sat && !b.sat && u.length <= a.k) NdvSketch(a.col, a.k, sat = false, u)
    else NdvSketch(a.col, a.k, sat = true, u.take(a.k))
  }

  // ---- sidecar I/O ----------------------------------------------------

  private def statsPath(table: String) = new Path(table, "_stats/ndv.json")

  private def fs(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sources] def sha1(parts: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    parts.sorted.foreach(p => md.update((p + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def b64(xs: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 8)
    xs.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private def fromB64(s: String): Array[Long] = {
    val raw = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(raw)
    Array.fill(raw.length / 8)(bb.getLong)
  }

  private[sources] def fingerprints(spark: SparkSession, table: String,
                                    version: Long): (String, String) = {
    val entries = SnapshotTable.readManifest(spark, table, version)
    val (_, deletes, _) = SnapshotTable.readListRaw(spark, table, version)
    (sha1(entries.map(_.path)), sha1(deletes.map(_.path)))
  }

  private val sketchRe =
    raw"""\{"col":"([^"]*)","k":(\d+),"sat":(true|false),"min":"([A-Za-z0-9+/=]*)"\}""".r
  // "sc" (decimal scale) is optional and omitted at 0, so integral-only
  // sidecars stay byte-identical to the pre-decimal format
  private val sumRe =
    raw"""\{"col":"([^"]*)","sm":"(-?[0-9]+)"(?:,"sc":(\d+))?,"nn":(\d+)\}""".r
  // per-partition sums: the outer item's `g` array is non-greedy (its
  // entries contain no brackets), values are base64 (data, not
  // identifiers)
  private val gsumRe =
    raw"""\{"col":"([^"]*)","pc":"([^"]*)","g":\[(.*?)\]\}""".r
  private val gsumItemRe =
    raw"""\{"v":"([A-Za-z0-9+/=]*)","sm":"(-?[0-9]+)"(?:,"sc":(\d+))?,"nn":(\d+)\}""".r
  // sketches non-greedy + optional sums/gsums sections: a pre-sums
  // sidecar parses with the groups absent (sketch bodies contain no
  // ']', and sum items contain no nested arrays — the FIRST ']' after
  // "sums" closes it)
  private val fileRe =
    raw"""\{"version":(\d+),"filesFp":"([0-9a-f]*)","delFp":"([0-9a-f]*)","sketches":\[(.*?)\](?:,"sums":\[(.*?)\])?(?:,"gsums":\[(.*)\])?\}""".r

  private def b64s(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def fromB64s(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private def writeStats(spark: SparkSession, table: String,
                         st: StatsFile): Unit = {
    val f = fs(spark, table)
    val p = statsPath(table)
    f.mkdirs(p.getParent)
    val body = st.sketches.map(s =>
      s"""{"col":"${s.col}","k":${s.k},"sat":${s.sat},"min":"${b64(s.minima)}"}""")
      .mkString(",")
    val sumsPart =
      if (st.sums.isEmpty) ""
      else st.sums.map { cs =>
        val sc = if (cs.sum.scale == 0) ""
          else s""","sc":${cs.sum.scale}"""
        s"""{"col":"${cs.col}","sm":"${cs.sum.unscaledValue.toString}"$sc,"nn":${cs.nonNull}}"""
      }.mkString(""","sums":[""", ",", "]")
    // partition VALUES are data, not identifiers — base64 them so a
    // quote or backslash in a value can never tear the sidecar
    val gsumsPart =
      if (st.groupSums.isEmpty) ""
      else st.groupSums.map { gs =>
        val items = gs.groups.map { case (v, sm, nn) =>
          val sc = if (sm.scale == 0) "" else s""","sc":${sm.scale}"""
          s"""{"v":"${b64s(v)}","sm":"${sm.unscaledValue.toString}"$sc,"nn":$nn}"""
        }.mkString(",")
        s"""{"col":"${gs.col}","pc":"${gs.partCol}","g":[$items]}"""
      }.mkString(""","gsums":[""", ",", "]")
    val json =
      s"""{"version":${st.version},"filesFp":"${st.filesFp}","delFp":"${st.delFp}","sketches":[$body]$sumsPart$gsumsPart}"""
    // best-effort sweep of tmp files a crashed writer left behind —
    // age-guarded (1 h) so a RACING writer's in-flight tmp is never
    // deleted from under it; a crashed attempt's file is referenced by
    // nothing and would otherwise accumulate forever
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    f.listStatus(p.getParent).foreach { st =>
      if (st.getPath.getName.startsWith(".ndv-") &&
        st.getPath.getName.endsWith(".tmp") &&
        st.getModificationTime < cutoff)
        f.delete(st.getPath, false)
    }
    val tmp = new Path(p.getParent, s".ndv-${java.util.UUID.randomUUID}.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // replace-by-rename: a torn replace leaves either the old intact
    // file or none — a missing/garbled sidecar just reads as "no stats"
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"table stats: could not publish $p")
  }

  /** The recorded sidecar, if present and parseable. */
  def readStats(spark: SparkSession, table: String): Option[StatsFile] = {
    val f = fs(spark, table)
    val p = statsPath(table)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
      body.trim match {
        case fileRe(v, ffp, dfp, sk, sm, gs) =>
          val sketches = sketchRe.findAllMatchIn(sk).map(m =>
            NdvSketch(m.group(1), m.group(2).toInt, m.group(3).toBoolean,
              fromB64(m.group(4)))).toSeq
          val sums = Option(sm).toSeq.flatMap(s =>
            sumRe.findAllMatchIn(s).map(m =>
              ColSum(m.group(1),
                new java.math.BigDecimal(
                  new java.math.BigInteger(m.group(2)),
                  Option(m.group(3)).map(_.toInt).getOrElse(0)),
                m.group(4).toLong)))
          val groupSums = Option(gs).toSeq.flatMap(s =>
            gsumRe.findAllMatchIn(s).map { m =>
              GroupSum(m.group(1), m.group(2),
                gsumItemRe.findAllMatchIn(m.group(3)).map { im =>
                  (fromB64s(im.group(1)),
                    new java.math.BigDecimal(
                      new java.math.BigInteger(im.group(2)),
                      Option(im.group(3)).map(_.toInt).getOrElse(0)),
                    im.group(4).toLong)
                }.toSeq)
            })
          Some(StatsFile(v.toLong, ffp, dfp, sketches, sums, groupSums))
        case _ => None
      }
    }
  }

  /** Exact decimal sums + non-null counts of `cols` (all INTEGRAL) in
    * ONE aggregate job — map-side combined partials, one row to the
    * driver.
    */
  /** The decimal(38, s) image a column's exact sum accumulates in —
    * integrals at scale 0, decimals at their own scale. Floating
    * columns refuse: double addition is order-dependent, so no
    * metadata sum could ever claim scan parity.
    */
  private def sumCastType(df: DataFrame, c: String): String = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => "decimal(38,0)"
      case d: DecimalType => s"decimal(38,${d.scale})"
      case other => throw new IllegalArgumentException(
        s"table stats: exact sums are integral/decimal-only (decimal " +
          s"addition is order-free there); $c is $other")
    }
  }

  /** Per-partition-value exact sums of `cols` — ONE `GROUP BY partCol`
    * job for every column (the values are cast to string: identical to
    * the manifest stamp rendering for the servable types — strings
    * verbatim, integrals via toString). NULL partition values are
    * excluded (never servable — they live under the default stamp the
    * grouped fold refuses). Group-count capped: the result is driver-
    * held sidecar metadata, not a table.
    */
  private def groupSumsOf(df: DataFrame, partCol: String,
                          cols: Seq[String]): Seq[GroupSum] = {
    if (cols.isEmpty) return Seq.empty
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).cast(sumCastType(df, c))).as(s"s_$c"),
      count(col(c)).as(s"n_$c")))
    val rows = df.filter(col(partCol).isNotNull)
      .groupBy(col(partCol).cast("string").as("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    require(rows.length <= 65536,
      s"table stats: $partCol has ${rows.length} partition values — " +
        "per-partition sums are sidecar metadata, not a table; refusing " +
        "to record more than 65536 groups")
    cols.zipWithIndex.map { case (c, i) =>
      GroupSum(c, partCol, rows.toSeq.map { r =>
        val nn = r.getLong(2 * i + 2)
        require(!r.isNullAt(2 * i + 1) || nn == 0L,
          s"table stats: decimal overflow summing $c in partition " +
            s"${r.getString(0)}")
        val s = if (r.isNullAt(2 * i + 1)) java.math.BigDecimal.ZERO
          else r.getDecimal(2 * i + 1)
        (r.getString(0), s, nn)
      }.sortBy(_._1))
    }
  }

  /** Additive merge of two per-value maps (the delta refresh). */
  private def mergeGroupSums(prev: Seq[GroupSum],
                             fresh: Seq[GroupSum]): Seq[GroupSum] =
    prev.map { p =>
      fresh.find(f => f.col == p.col && f.partCol == p.partCol) match {
        case None => p
        case Some(f) =>
          val fm = f.groups.map(g => g._1 -> g).toMap
          val merged = p.groups.map { case (v, sm, nn) =>
            fm.get(v) match {
              case Some((_, fsm, fnn)) => (v, sm.add(fsm), nn + fnn)
              case None                => (v, sm, nn)
            }
          } ++ f.groups.filterNot(g => p.groups.exists(_._1 == g._1))
          GroupSum(p.col, p.partCol, merged.sortBy(_._1))
      }
    }

  private def sumsOf(df: DataFrame, cols: Seq[String]): Seq[ColSum] = {
    if (cols.isEmpty) return Seq.empty
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).cast(sumCastType(df, c))).as(s"s_$c"),
      count(col(c)).as(s"n_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val nn = r.getLong(2 * i + 1)
      // a NULL decimal sum with non-null rows is silent decimal-38
      // overflow (non-ANSI mode) — recording ZERO would be a lie
      require(!r.isNullAt(2 * i) || nn == 0L,
        s"table stats: decimal overflow summing $c")
      val s = if (r.isNullAt(2 * i)) java.math.BigDecimal.ZERO
        else r.getDecimal(2 * i)
      ColSum(c, s, nn)
    }
  }

  /** Compute + publish sketches (and, for `sumCols`, exact column
    * sums) for the table's CURRENT version (the masked read — pending
    * equality deletes are applied, so the stats describe visible
    * rows). An empty `sumCols` CARRIES the previously recorded sum
    * columns forward (recomputed at the new version) — a plain
    * `snapshot_analyze` must not silently destroy the sum tier its
    * sibling procedure recorded; the whole sidecar stays one
    * consistent snapshot in both directions. Returns what was written.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String],
              k: Int = 1024, sumCols: Seq[String] = Seq.empty,
              groupSumCols: Seq[String] = Seq.empty): StatsFile = {
    val v = SnapshotTable.currentVersion(spark, table)
    val df = SnapshotTable.readVersion(spark, table, v)
    val prev = readStats(spark, table)
    val effSumCols =
      if (sumCols.nonEmpty) sumCols
      else prev.map(_.sums.map(_.col)).getOrElse(Seq.empty)
    // like sums, an empty groupSumCols CARRIES the recorded per-
    // partition lane forward (recomputed at the new version)
    val effGroupCols =
      if (groupSumCols.nonEmpty) groupSumCols
      else prev.map(_.groupSums.map(_.col)).getOrElse(Seq.empty)
    val (sketches, sums) = sketchesAndSums(df, cols, k, effSumCols)
    val gsums =
      if (effGroupCols.isEmpty) Seq.empty
      else {
        val (_, _, hdr) = SnapshotTable.readListRaw(spark, table, v)
        val pc = hdr.partCol.getOrElse(sys.error(
          s"table stats: $table has no partition column — per-partition " +
            "sums need one"))
        groupSumsOf(df, pc, effGroupCols)
      }
    val (ffp, dfp) = fingerprints(spark, table, v)
    val st = StatsFile(v, ffp, dfp, sketches, sums, gsums)
    writeStats(spark, table, st)
    st
  }

  /** Advance the sidecar to the current version. DELTA path when every
    * commit since the analyzed version only ADDED data files and left
    * the delete list untouched: sketch the fresh files only, merge.
    * Anything else (removed/rewritten files, new equality deletes — a
    * sketch cannot subtract) falls back to a full [[analyze]].
    * Returns the published stats and whether the delta path was taken.
    */
  def refresh(spark: SparkSession, table: String): (StatsFile, Boolean) = {
    val prev = readStats(spark, table).getOrElse(
      sys.error(s"table stats: $table has no recorded sidecar — run analyze"))
    val cur = SnapshotTable.currentVersion(spark, table)
    if (cur == prev.version) (prev, true)
    else {
      val oldEntries = SnapshotTable.readManifest(spark, table, prev.version)
      val newEntries = SnapshotTable.readManifest(spark, table, cur)
      val (_, oldDel, _) = SnapshotTable.readListRaw(spark, table, prev.version)
      val (_, newDel, hdr) = SnapshotTable.readListRaw(spark, table, cur)
      val oldPaths = oldEntries.map(_.path).toSet
      val removed = oldPaths -- newEntries.map(_.path).toSet
      val appendOnly = removed.isEmpty &&
        oldDel.map(_.path).sorted == newDel.map(_.path).sorted &&
        fingerprints(spark, table, prev.version)._1 == prev.filesFp
      if (appendOnly) {
        val freshEntries = newEntries.filterNot(e => oldPaths.contains(e.path))
        // the WHOLE window's stats — every sketch column AND every sum
        // column — ride one fused aggregation job per distinct sketch
        // size (one, in practice): at ingest cadence the per-tick cost
        // is a single pass over the fresh files, not a Spark action
        // per tracked column. Sums are additive, so the delta is EXACT
        // (fresh decimal sums add onto the recorded ones, no budget).
        val (freshStats, freshSums):
            (Map[String, NdvSketch], Seq[ColSum]) =
          if (freshEntries.isEmpty ||
              (prev.sketches.isEmpty && prev.sums.isEmpty))
            (Map.empty, Seq.empty)
          else {
            val freshDf =
              SnapshotTable.readFiles(spark, table, freshEntries, hdr.schema)
            val kGroups = prev.sketches.groupBy(_.k).toSeq
              .sortBy(-_._2.size)
            kGroups match {
              case Nil =>
                (Map.empty[String, NdvSketch],
                  sumsOf(freshDf, prev.sums.map(_.col)))
              case (k0, sks0) +: rest =>
                // sums ride the LARGEST sketch group's job
                val (s0, sums0) = sketchesAndSums(freshDf,
                  sks0.map(_.col), k0, prev.sums.map(_.col))
                val more = rest.flatMap { case (k, sks) =>
                  sketchesAndSums(freshDf, sks.map(_.col), k, Seq.empty)._1
                }
                ((s0 ++ more).map(s => s.col -> s).toMap, sums0)
            }
          }
        val merged = prev.sketches.map { s =>
          freshStats.get(s.col).map(merge(s, _)).getOrElse(s)
        }
        val mergedSums =
          if (freshSums.isEmpty) prev.sums
          else prev.sums.zip(freshSums).map { case (a, b) =>
            ColSum(a.col, a.sum.add(b.sum), a.nonNull + b.nonNull)
          }
        // per-partition sums: one extra grouped job over the fresh
        // files, merged additively per (col, value) — opted-in tables
        // only (the lane is empty otherwise)
        val mergedGroupSums =
          if (prev.groupSums.isEmpty || freshEntries.isEmpty) prev.groupSums
          else {
            val freshDf =
              SnapshotTable.readFiles(spark, table, freshEntries, hdr.schema)
            val pc = prev.groupSums.head.partCol
            mergeGroupSums(prev.groupSums,
              groupSumsOf(freshDf, pc, prev.groupSums.map(_.col)))
          }
        val (ffp, dfp) = fingerprints(spark, table, cur)
        val st = StatsFile(cur, ffp, dfp, merged, mergedSums,
          mergedGroupSums)
        writeStats(spark, table, st)
        (st, true)
      } else
        (analyze(spark, table, prev.sketches.map(_.col),
          prev.sketches.headOption.map(_.k).getOrElse(1024),
          sumCols = prev.sums.map(_.col)), false)
    }
  }

  /** Re-bind the sidecar across a ROW-SET-PRESERVING maintenance commit
    * (compaction, Z-order clustering): the files changed but the
    * visible rows did not, so the sketches stay valid verbatim — only
    * the fingerprint moves. Fires only when the sidecar provably
    * described `fromVersion` (version + fingerprint match); binds to
    * `toVersion` specifically, never "current" — a commit racing in
    * after the maintenance publish must not inherit the claim. Returns
    * whether a re-bind happened; callers fall back to nothing (the
    * stale sidecar simply refuses to serve, as always).
    */
  def rebind(spark: SparkSession, table: String,
             fromVersion: Long, toVersion: Long): Boolean =
    readStats(spark, table) match {
      case Some(st) if st.version == fromVersion &&
          fingerprints(spark, table, fromVersion) == ((st.filesFp, st.delFp)) =>
        val (ffp, dfp) = fingerprints(spark, table, toVersion)
        writeStats(spark, table,
          StatsFile(toVersion, ffp, dfp, st.sketches, st.sums,
            st.groupSums))
        true
      case _ => false
    }

  /** Exact distinct count of `column` for a reader planning exactly
    * `plannedPaths` — the PROOF interface the optimizer rule uses:
    * fires only when the sidecar's fingerprint matches the planned file
    * list, the analyzed state had no pending deletes, and the sketch
    * never saturated. None otherwise — never an estimate.
    */
  def exactDistinct(spark: SparkSession, table: String, column: String,
                    plannedPaths: Seq[String]): Option[Long] =
    readStats(spark, table).flatMap { st =>
      if (st.filesFp != sha1(plannedPaths)) None
      else if (st.delFp != sha1(Seq.empty)) None
      else st.sketches.find(_.col == column).flatMap(_.exact)
    }

  /** Exact column SUM (+ non-null count) for a reader planning exactly
    * `plannedPaths` — the [[exactDistinct]] twin for the SUM fold
    * ([[graft.plans.MetadataAggPushdown]]): fires only when the
    * sidecar's fingerprint matches the planned file list and the
    * analyzed state had no pending delete masks. Integral-only by
    * construction (see [[analyze]]'s `sumCols`), decimal-exact,
    * O(Δ)-maintained — `SELECT SUM(col)` on a 100 TB table becomes a
    * sidecar read.
    */
  def exactSum(spark: SparkSession, table: String, column: String,
               plannedPaths: Seq[String])
      : Option[(java.math.BigDecimal, Long)] =
    readStats(spark, table).flatMap { st =>
      if (st.filesFp != sha1(plannedPaths)) None
      else if (st.delFp != sha1(Seq.empty)) None
      else st.sums.find(_.col == column).map(cs => (cs.sum, cs.nonNull))
    }

  /** Exact PER-PARTITION-VALUE sums (+ non-null counts) of `column`
    * for a reader planning exactly `plannedPaths` — the
    * [[exactSum]] twin for the GROUPED metadata fold: returns
    * (partition column, value → (sum, nonNull)). Values are keyed by
    * the column's VALUE (stamp-rendered string), so the proof is
    * layout-independent; the usual gates apply (fingerprint match, no
    * pending deletes at analyze time).
    */
  def exactGroupSum(spark: SparkSession, table: String, column: String,
                    plannedPaths: Seq[String])
      : Option[(String, Map[String, (java.math.BigDecimal, Long)])] =
    readStats(spark, table).flatMap { st =>
      if (st.filesFp != sha1(plannedPaths)) None
      else if (st.delFp != sha1(Seq.empty)) None
      else st.groupSums.find(_.col == column).map(gs =>
        (gs.partCol, gs.groups.map(g => g._1 -> ((g._2, g._3))).toMap))
    }

  /** [[exactSum]] WITH the current-version freshness proof — the SQL
    * TVF's gate (`snapshot_sums`): version AND both fingerprints must
    * match the CURRENT state, so a delete-only commit (same data
    * paths, new delete files) refuses instead of serving deleted rows'
    * totals. The optimizer path doesn't need this (a masked read never
    * presents the bare-relation shape), but a TVF answers outside any
    * plan shape and must carry the proof itself.
    */
  def sumsServed(spark: SparkSession, table: String, column: String)
      : Option[(java.math.BigDecimal, Long)] =
    readStats(spark, table).flatMap { st =>
      val cur = SnapshotTable.currentVersion(spark, table)
      if (st.version != cur) None
      else if (fingerprints(spark, table, cur) != ((st.filesFp, st.delFp)))
        None
      else st.sums.find(_.col == column).map(cs => (cs.sum, cs.nonNull))
    }

  /** [[exactGroupSum]] WITH the current-version freshness proof — the
    * `snapshot_group_sums` TVF's gate (same contract as [[sumsServed]]).
    */
  def groupSumsServed(spark: SparkSession, table: String, column: String)
      : Option[GroupSum] =
    readStats(spark, table).flatMap { st =>
      val cur = SnapshotTable.currentVersion(spark, table)
      if (st.version != cur) None
      else if (fingerprints(spark, table, cur) != ((st.filesFp, st.delFp)))
        None
      else st.groupSums.find(_.col == column)
    }

  /** An upper BOUND on `column`'s distinct count over ANY reader whose
    * planned files are a subset of the analyzed version's live set —
    * the broadcast-sizing interface ([[graft.plans.StatsBroadcast]]'s
    * aggregate case): fires only when the sketch never saturated (an
    * unsaturated sketch IS the column's complete distinct-hash set, so
    * its cardinality bounds every subset), the analyzed state had no
    * pending delete masks, and every planned path was live at the
    * analyzed version (a vacuumed-away analyzed manifest reads as
    * None). Never an estimate.
    */
  def boundDistinct(spark: SparkSession, table: String, column: String,
                    plannedPaths: Seq[String]): Option[Long] =
    readStats(spark, table).flatMap { st =>
      if (st.delFp != sha1(Seq.empty)) None
      else scala.util.Try {
        val (paths, masked) = SnapshotTable.liveState(spark, table, st.version)
        if (masked || !plannedPaths.forall(paths.contains)) None
        else st.sketches.find(_.col == column).flatMap(_.exact)
      }.toOption.flatten
    }

  /** The (possibly estimated) distinct count with its exactness flag —
    * the operational interface: `(value, exact)`.
    */
  def estimateDistinct(spark: SparkSession, table: String,
                       column: String): Option[(Double, Boolean)] =
    readStats(spark, table).flatMap(_.sketches.find(_.col == column))
      .map(s => (s.estimate, !s.sat))

  /** Cross-table distinct-set arithmetic on two sketches (the
    * Iceberg-Puffin / theta-sketch "audience overlap" operation on the
    * KMV construction): union and intersection distinct counts without
    * reading either table.
    *
    * EXACT regime: an unsaturated sketch IS its column's complete
    * distinct-hash set, so set arithmetic on the hash sets is exact —
    * under the same 64-bit-collision-free assumption the exact NDV
    * fold already makes. Any saturated input demotes to an ESTIMATE
    * over the shared certainty region θ = min of the sketches'
    * coverage: below θ each sketch is a complete sample of its set,
    * so |A ∪ B| comes from the merged sketch's own estimator and
    * |A ∩ B| ≈ |shared hashes ≤ θ| / θ. `exact` says which regime
    * produced the numbers — an estimate is never served in disguise.
    */
  final case class NdvOverlap(union: Double, intersect: Double,
                              exact: Boolean)

  def overlap(a: NdvSketch, b: NdvSketch): NdvOverlap = {
    require(a.k == b.k,
      s"ndv overlap: mismatched sketch sizes (${a.k} vs ${b.k})")
    val sa = a.minima.toSet
    val sb = b.minima.toSet
    if (!a.sat && !b.sat)
      NdvOverlap((sa ++ sb).size.toDouble, (sa & sb).size.toDouble,
        exact = true)
    else {
      def ule(x: Long, y: Long) =
        (x ^ Long.MinValue) <= (y ^ Long.MinValue)
      // coverage boundary: the largest retained minimum of each
      // SATURATED side bounds where its sample is complete; an
      // unsaturated side is complete everywhere
      val bounds = Seq(a, b).filter(_.sat).map(_.minima.last)
      val hStar = bounds.reduce((x, y) => if (ule(x, y)) x else y)
      val theta = unsignedFraction(hStar)
      val shared = (sa & sb).count(ule(_, hStar))
      // cross-TABLE overlap is the advertised use, so the sketches may
      // carry different column names — merge() checks names because a
      // same-table merge with mismatched columns is a bug, but here the
      // caller owns column semantics; align the label before merging
      NdvOverlap(merge(a, b.copy(col = a.col)).estimate,
        shared / theta, exact = false)
    }
  }
}
