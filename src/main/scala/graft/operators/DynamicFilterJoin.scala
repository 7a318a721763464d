package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `[EXT]` Runtime join-key file pruning — the driver-side form of
  * dynamic partition pruning / Trino-style dynamic filtering, for
  * snapshot-table scans: before an INNER equi-join, collect the dim
  * side's distinct join keys (bounded), and seed the fact side with
  * `factKey IN (keys…)`. Over a snapshot read that IN list reaches
  * [[graft.sources.SnapshotFileIndex]] as a pushed filter, so files
  * whose partition value, min/max stats, or bloom filter prove no key
  * can match are never planned — at 100 TB a fact⋈small-dim join scans
  * only the dim-relevant slice of the fact table instead of all of it,
  * with Spark's own scan machinery doing the skipping.
  *
  * Scale contract: the key collect is capped (`maxKeys`, default 10k —
  * a few hundred KB of driver memory); a dim with more distinct keys
  * falls back to the plain join untouched, so the helper is never the
  * thing that OOMs the driver. INNER join only: seeding the fact side
  * with the dim's keys is semantics-preserving exactly because inner
  * equality discards fact rows with no dim partner (and NULL keys,
  * which both the IN and the join drop). An outer join must not use
  * this — the pruned fact rows would wrongly vanish from its result.
  *
  * [[graft.plans.DynamicPrune]] is the TRANSPARENT optimizer-rule form
  * of the same construction: register the dim snapshot table once and
  * every plain `.join` / SQL star query over it gets the pruning,
  * with manifest-proven size gates and a zero-file plan for a
  * proven-empty build (where this helper degrades to the plain join).
  */
object DynamicFilterJoin {

  /** `fact INNER JOIN dim ON fact(factKey) = dim(dimKey)`, with the
    * fact scan pre-filtered by the dim's collected key set when the
    * dim is small enough. Extra join conditions can be applied by the
    * caller on the result (they see both sides' columns).
    */
  def inner(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            maxKeys: Int = 10000): DataFrame = {
    // NULLs are excluded BEFORE the cap sample: a NULL landing inside a
    // limit(maxKeys+1) sample would eat a slot, letting an over-cap dim
    // masquerade as exactly-at-cap and seed the fact scan with an
    // incomplete IN list (dropped inner-join rows). Filtering first
    // keeps the over-cap check exact; NULL keys never join anyway.
    val keys = dim.select(col(dimKey)).filter(col(dimKey).isNotNull)
      .distinct().limit(maxKeys + 1).collect().map(_.get(0))
    val seeded =
      if (keys.nonEmpty && keys.length <= maxKeys)
        fact.filter(col(factKey).isin(keys.toIndexedSeq: _*))
      else fact
    seeded.join(dim, seeded(factKey) === dim(dimKey))
  }
}
