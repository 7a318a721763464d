package graft

import org.apache.spark.sql.SparkSession

/** Job labelling (guide §1.5): wrap a phase so every job it submits
  * carries a readable description in the UI / Profile output. Restores
  * the enclosing label (descriptions are thread-local), so nested
  * phases compose — the innermost label wins for its own jobs only.
  */
private[graft] object JobLabel {
  def apply[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Label only when no enclosing phase set one — for shared plumbing
    * (writes, stats) whose caller's label is the interesting one.
    */
  def ifUnset[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    if (sc.getLocalProperty("spark.job.description") != null) body
    else {
      sc.setJobDescription(desc)
      try body finally sc.setJobDescription(null)
    }
  }
}
