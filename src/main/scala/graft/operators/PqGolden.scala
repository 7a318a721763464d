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

  val rerankSql: String =
    """SELECT CAST(334 AS BIGINT) AS vec_id, CAST(0.362722 AS DOUBLE) AS sim,
      |       CAST(0.313616 AS DOUBLE) AS sim_pq
      |UNION ALL SELECT 423, 0.296934, 0.26911
      |UNION ALL SELECT 190, 0.281795, 0.270334
      |UNION ALL SELECT 464, 0.276628, 0.276995
      |UNION ALL SELECT 388, 0.276301, 0.241452
      |UNION ALL SELECT 483, 0.2567, 0.343424
      |UNION ALL SELECT 131, 0.240641, 0.283917
      |UNION ALL SELECT 36, 0.238657, 0.186702
      |UNION ALL SELECT 415, 0.237975, 0.285691
      |UNION ALL SELECT 478, 0.237283, 0.208403
      |ORDER BY sim DESC, vec_id""".stripMargin

  val ivfPqSql: String =
    """SELECT CAST(365 AS BIGINT) AS vec_id, CAST(6 AS INT) AS ivf_list,
      |       CAST(0.369994 AS DOUBLE) AS sim
      |UNION ALL SELECT 334, 6, 0.362722
      |UNION ALL SELECT 73, 6, 0.295434
      |UNION ALL SELECT 190, 1, 0.281795
      |UNION ALL SELECT 388, 1, 0.276301
      |UNION ALL SELECT 344, 6, 0.252487
      |UNION ALL SELECT 36, 13, 0.238657
      |UNION ALL SELECT 478, 6, 0.237283
      |UNION ALL SELECT 85, 10, 0.232639
      |UNION ALL SELECT 70, 10, 0.192008
      |ORDER BY sim DESC, vec_id""".stripMargin

  val recallSql: String =
    """SELECT CAST(1.0 AS DOUBLE) AS sq8_recall_at10,
      |  CAST(0.4 AS DOUBLE) AS pq_recall_at10,
      |  CAST(0.5 AS DOUBLE) AS pq_rerank_recall_at10,
      |  CAST(0.5 AS DOUBLE) AS ivfpq_recall_at10,
      |  CAST(8 AS BIGINT) AS pq_bytes_per_vec,
      |  CAST(256 AS BIGINT) AS raw_bytes_per_vec""".stripMargin
}
