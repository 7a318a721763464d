package graft.operators

import org.apache.spark.util.LongAccumulator

/** Occupancy-cap drop counters for a single candidate-generation plan,
  * returned to the caller alongside its DataFrame (never shared global
  * state — two concurrent plans each own their accumulators).
  *
  * Values are meaningful after the DataFrame materializes and are
  * AT-LEAST-ONCE diagnostics: accumulator updates inside UDFs re-fire
  * under task retry/speculation, so treat nonzero as "drops happened
  * (at least `slots` doc slots)", not as an exact count. Also visible
  * per-stage in the Spark UI under the accumulator names.
  */
case class DropStats(buckets: LongAccumulator, slots: LongAccumulator) {
  def any: Boolean = buckets.value > 0
}
