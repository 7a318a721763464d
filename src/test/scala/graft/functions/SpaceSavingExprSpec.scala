package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions

class SpaceSavingExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("SpaceSavingExprSpec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** 2 heavy items (500 each) in a 900-item singleton tail: N = 1900,
    * cap = 64 ⇒ N/cap ≈ 30 ≪ 500, so the guarantee must hold under
    * eviction pressure at ANY partitioning / arrival order.
    */
  private def skewed(shuffleSeed: Int) = {
    val sp = spark
    import sp.implicits._
    val rows = scala.util.Random.javaRandomToRandom(
      new java.util.Random(shuffleSeed)).shuffle(
      (Seq.fill(500)("heavy_a") ++ Seq.fill(500)("heavy_b") ++
        (0 until 900).map(i => f"tail_$i%03d")).toList)
    rows.toDF("item")
  }

  test("heavy items with freq > N/cap survive eviction at bounded size, " +
    "with true count inside [cnt - err, cnt], at any partitioning") {
    for ((parts, seed) <- Seq((1, 7), (4, 13), (32, 99))) {
      val sk = skewed(seed).repartition(parts)
        .agg(SpaceSavingExpr(col("item"), 64).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.cnt"), col("e.err"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(sk.size == 64, "sketch must be trimmed to capacity")
      for (h <- Seq("heavy_a", "heavy_b")) {
        val (cnt, err) = sk.getOrElse(h, fail(s"$h missing at parts=$parts"))
        assert(cnt >= 500L, s"$h count is an upper bound")
        assert(cnt - err <= 500L, s"$h error bound must cover the true count")
      }
    }
  }

  test("no eviction (cardinality <= capacity) => the sketch IS the exact " +
    "histogram, err = 0 everywhere") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 10).flatMap(i => Seq.fill(i)(s"w$i")).toDF("item")
      .repartition(3)
    val sk = df.agg(SpaceSavingExpr(col("item"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sk.length == 10)
    assert(sk.forall(_._3 == 0L))
    assert(sk.map(e => e._1 -> e._2).toMap == (1 to 10).map(i => s"w$i" -> i.toLong).toMap)
    // deterministic output order: cnt desc, ties item asc
    assert(sk.map(_._2).toSeq == sk.map(_._2).sorted.reverse.toSeq)
  }

  test("q_heavy_hitters: two-pass result equals the naive exact top-k") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextAnalysis.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val docs = graft.Tables.documents(spark, dir)
    val exact = docs.select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
    // and the candidate pass genuinely bounds the recount input
    val cands = graft.operators.TextAnalysis.heavyHitters(spark, dir, capacity = 8, k = 8)
      .collect()
    assert(cands.length <= 8)
  }

  test("plan shape: partial sketches map-side, candidates broadcast into a " +
    "semi-join, top-k is TakeOrderedAndProject, no UDF") {
    val df = graft.operators.TextAnalysis.heavyHitters(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_spacesavingexpr"),
      s"sketch must combine map-side before the single-partition merge:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"bounded candidate set must broadcast into the recount semi-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"final top-k must avoid a full sort:\n$plan")
    assert(!plan.contains("UDF"))
  }

  test("SQL registration + analysis-time type errors") {
    val sp = spark
    import sp.implicits._
    Seq("a", "a", "b").toDF("s").createOrReplaceTempView("ss_t")
    val viaSql = spark.sql(
      "SELECT space_saving(s, 4) AS sk FROM ss_t")
      .select(explode(col("sk")).as("e")).select(col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql == Set(("a", 2L), ("b", 1L)))
    val ex = intercept[AnalysisException] {
      spark.sql("SELECT space_saving(CAST(1 AS INT), 4) FROM ss_t").collect()
    }
    assert(ex.getMessage.contains("STRING"))
    val ex2 = intercept[AnalysisException] {
      spark.sql("SELECT space_saving(s, s) FROM ss_t").collect()
    }
    assert(ex2.getMessage.contains("integral literal"))
  }
}
