package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic stratified sampling aggregate: `sample_k(id, seed, k)`
  * keeps, per group, the k ids with the SMALLEST md5("seed:id") priority
  * — the bottom-k-by-hashed-priority sketch (the distributed,
  * order-independent form of reservoir sampling).
  *
  * Why priorities instead of a classic reservoir: a reservoir's kept set
  * depends on encounter order, so the "same" query returns different
  * members under different partitionings / AQE decisions — useless for
  * auditable train/holdout splits. Hashed priorities make membership a
  * pure function of (seed, id): deterministic under any partitioning,
  * mergeable map-side (bottom-k is associative/commutative), k × ~40
  * bytes per shuffled buffer, and reproducible by ANY engine that has
  * md5 — the DuckDB oracle recomputes the exact member set (see
  * `q_sample_k`), unlike `rand(seed)`-based sampling whose generator is
  * engine-private. Changing the seed draws an independent sample;
  * `groupBy(stratum).agg(sample_k(...))` is stratified sampling.
  *
  * Returns `array<struct<id bigint, pri string>>` sorted priority asc
  * (ties id asc). Reference analogue: random patient subset selection at
  * similarity_search.py:432-435 (numpy permutation — order-dependent,
  * single-node); this is its warehouse-scale replacement.
  */
case class SampleKExpr(idExpr: Expression, seedExpr: Expression, kExpr: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SampleKExpr.Buffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"sample_k k must be a literal int, got $other")
  }

  private lazy val seed: Long = seedExpr.eval(InternalRow.empty) match {
    case i: Int  => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(
      s"sample_k seed must be a literal bigint, got $other")
  }

  override def children: Seq[Expression] = Seq(idExpr, seedExpr, kExpr)

  // fail misuse at ANALYSIS time (update() casts id straight to Long;
  // without this, sample_k(int_col, ...) would pass analysis and throw
  // ClassCastException mid-job)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sample_k id must be BIGINT, got ${idExpr.dataType.simpleString} (cast the id column)")
    else if (!seedExpr.foldable || !Seq(IntegerType, LongType).contains(seedExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"sample_k seed must be an integral literal, got ${seedExpr.sql}")
    else if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"sample_k k must be an integral literal, got ${kExpr.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("pri", StringType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): SampleKExpr.Buffer =
    new SampleKExpr.Buffer(k)

  override def update(buf: SampleKExpr.Buffer, input: InternalRow): SampleKExpr.Buffer = {
    val idV = idExpr.eval(input)
    if (idV != null) {
      val id = idV.asInstanceOf[Long]
      buf.push(SampleKExpr.priority(seed, id), id)
    }
    buf
  }

  override def merge(a: SampleKExpr.Buffer, b: SampleKExpr.Buffer): SampleKExpr.Buffer = {
    var i = 0
    while (i < b.size) { a.push(b.pris(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: SampleKExpr.Buffer): Any = {
    val pairs = (0 until buf.size)
      .map(i => (buf.pris(i), buf.ids(i)))
      .sorted
    new GenericArrayData(pairs.map { case (pri, id) =>
      InternalRow(id, UTF8String.fromString(pri))
    }.toArray[Any])
  }

  override def serialize(buf: SampleKExpr.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 44)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.ids(i)); out.writeUTF(buf.pris(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SampleKExpr.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SampleKExpr.Buffer(k)
    var i = 0
    while (i < n) {
      val id = in.readLong(); val pri = in.readUTF()
      buf.push(pri, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleKExpr =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SampleKExpr =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), seedExpr = newChildren(1), kExpr = newChildren(2))
}

object SampleKExpr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 32-hex md5 of "seed:id" — identical to SQL `md5(seed || ':' || id)`,
    * so any md5-bearing engine reproduces the sample membership. Hex
    * string comparison ≡ unsigned 128-bit comparison.
    */
  def priority(seed: Long, id: Long): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest((seed.toString + ":" + id.toString)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xF)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Parallel-array MAX-heap of ≤ k (pri, id): root = largest kept pair,
    * so `push` keeps the k smallest (pri, id) seen — order-independent.
    */
  final class Buffer(k: Int) {
    val pris = new Array[String](math.max(k, 0))
    val ids = new Array[Long](math.max(k, 0))
    var size = 0

    private def gt(p1: String, i1: Long, p2: String, i2: Long): Boolean = {
      val c = p1.compareTo(p2)
      c > 0 || (c == 0 && i1 > i2)
    }

    private def swap(a: Int, b: Int): Unit = {
      val tp = pris(a); pris(a) = pris(b); pris(b) = tp
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(from: Int): Unit = {
      var i = from
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && gt(pris(l), ids(l), pris(m), ids(m))) m = l
        if (r < size && gt(pris(r), ids(r), pris(m), ids(m))) m = r
        if (m == i) continue = false
        else { swap(i, m); i = m }
      }
    }

    private def siftUp(from: Int): Unit = {
      var i = from
      while (i > 0) {
        val p = (i - 1) / 2
        if (gt(pris(i), ids(i), pris(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    def push(pri: String, id: Long): Unit =
      if (size < pris.length) {
        pris(size) = pri; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (size > 0 && gt(pris(0), ids(0), pri, id)) {
        pris(0) = pri; ids(0) = id
        siftDown(0)
      }
  }

  /** Column-API form: `sampleK(col("id"), seed, k)`. */
  def apply(id: Column, seed: Long, k: Int): Column =
    GraftColumnBridge.column(
      SampleKExpr(
        GraftColumnBridge.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(seed),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
