package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M3 — federated round loop (similarity_search.py:436-474), Spark-native:
  *
  *  - shard boundary = `hospital` column; each round ships the global
  *    weights to executors once (task closure, ~0.4 MB) and runs one local
  *    training job per shard IN PARALLEL via
  *    `groupByKey(hospital).mapGroups` (the reference trains hospitals
  *    sequentially in a for-loop — similarity_search.py:451);
  *  - each task returns (weights, n_samples); the driver does the A5
  *    FedAvg weighted average (similarity_search.py:476-493) and loops.
  *
  * Driver↔executor crossings per round: 1 broadcast down (weights in
  * closure), 1 collect up (k flattened weight vectors, k = #hospitals).
  *
  * Scale: hospitals train concurrently across the cluster; a shard's
  * feature matrix must fit in one task (reference semantics — each
  * hospital's model sees its whole local dataset batch-by-batch). For
  * shards beyond single-task memory, sub-shard then FedAvg the sub-shards
  * — same algebra, one more level of averaging.
  */
object FederatedTrainer {

  case class TrainResult(hospital: String, flat: Array[Double], n: Long, finalLoss: Double)

  /** One federated training run over a DataFrame bearing `hospital` and a
    * float-array `features` column (P1/P2 output). Returns the trained
    * global weights plus per-round mean losses for observability.
    */
  def train(patients: DataFrame, rounds: Int = 3, localEpochs: Int = 5,
            batchSize: Int = 32, lr: Double = 1e-3, seed: Long = 42L):
      (Mlp.Weights, Seq[Double]) = {
    val spark = patients.sparkSession
    import spark.implicits._

    val ds = patients
      .select(col("hospital"), col("features").cast("array<double>").as("features"))
      .as[(String, Array[Double])]

    var global = Mlp.init(seed)
    val roundLosses = Seq.newBuilder[Double]

    (0 until rounds).foreach { _ =>
      val globalFlat = global.flatten // serialized into the task closure
      val results = ds.groupByKey(_._1)
        .mapGroups { (hospital, rows) =>
          val x = rows.map(_._2).toArray
          val (wts, losses) = Mlp.localFit(Mlp.unflatten(globalFlat), x,
            epochs = localEpochs, batchSize = batchSize, lr = lr)
          TrainResult(hospital, wts.flatten, x.length.toLong,
            if (losses.nonEmpty) losses.last else Double.NaN)
        }
        .collect()

      global = Mlp.fedAvg(results.toSeq.map(r => (Mlp.unflatten(r.flat), r.n)))
      roundLosses += {
        val ls = results.map(_.finalLoss).filterNot(_.isNaN)
        if (ls.nonEmpty) ls.sum / ls.length else Double.NaN
      }
    }
    (global, roundLosses.result())
  }

  /** M4 — batch inference: embed every row's feature array with the
    * trained weights (similarity_search.py:495-506). The weights ride the
    * task closure; the UDF is a pure Array[Float] ⇒ Array[Float] map —
    * embarrassingly parallel, no shuffle.
    */
  def withEmbeddings(df: DataFrame, wts: Mlp.Weights,
                     featuresCol: String = "features",
                     outputCol: String = "embedding"): DataFrame = {
    val w = wts // serialized once per task, not per row
    val embed = udf { x: Seq[Float] => Mlp.forward(w, x.toArray) }
    df.withColumn(outputCol, embed(col(featuresCol)))
  }
}
