package graft.operators

/** Golden values for q_ann_pq (sf0.01, pinned build) — see
  * [[ProductQuant.oracleSql]]. Captured via `graft.GoldenIvf` and
  * reproduced bit-identically in fresh JVMs at local[4]/sp=4,
  * local[7]/sp=13 and local[32]/sp=32 before pinning.
  */
private[operators] object PqGolden {
  val sql: String =
    """SELECT CAST(483 AS BIGINT) AS vec_id, CAST(0.343424 AS DOUBLE) AS sim_pq
      |UNION ALL SELECT 334, 0.313616
      |UNION ALL SELECT 415, 0.285691
      |UNION ALL SELECT 108, 0.285456
      |UNION ALL SELECT 131, 0.283917
      |UNION ALL SELECT 370, 0.280292
      |UNION ALL SELECT 464, 0.276995
      |UNION ALL SELECT 84, 0.272265
      |UNION ALL SELECT 190, 0.270334
      |UNION ALL SELECT 423, 0.26911
      |ORDER BY sim_pq DESC, vec_id""".stripMargin
}
