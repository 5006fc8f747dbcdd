package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Pruning

/** Data-pruning queries over `embeddings`: prototype-distance pruning
  * (q162) — keep the hardest 70% of each cluster per Sorscher et al.
  * 2022. The prototype index is the q73-style formula-deterministic
  * centroid table (production: a persisted `KMeansLloyd.fit`, q151);
  * the oracle replays assignment, hardness, and the per-cell ceil-keep
  * election, which also proves the two-phase rank equals the
  * single-window rank on real data. */
object PruningQueries {

  private val K = 8
  private val Dim = 64

  /** cent(k, j) = ((k*37 + j*11) % 13 - 6) / 6 — distinct from the q73
    * index so cells differ, same exactness argument. */
  private def cents: Seq[Seq[Double]] =
    Seq.tabulate(K, Dim)((k, j) => ((k * 37 + j * 11) % 13 - 6) / 6.0).map(_.toSeq)

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sqlBacked(
      "q162_proto_prune",
      s"""WITH cells AS (SELECT unnest(range(0, $K)) AS cell),
         |cd AS (
         |  SELECT vec_id, cell,
         |    list_reduce([(CAST(embedding[j] AS DOUBLE)
         |        - CAST((cell*37 + (j-1)*11) % 13 - 6 AS DOUBLE) / 6.0)
         |      * (CAST(embedding[j] AS DOUBLE)
         |        - CAST((cell*37 + (j-1)*11) % 13 - 6 AS DOUBLE) / 6.0)
         |      FOR j IN range(1, ${Dim + 1})], (x, y) -> x + y) AS d2
         |  FROM embeddings CROSS JOIN cells),
         |asg AS (
         |  SELECT vec_id, CAST(cell AS BIGINT) AS cell,
         |    CAST(round(d2 * 1e6) AS BIGINT) AS d_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, cell) AS rn FROM cd)
         |  WHERE rn = 1),
         |nk AS (SELECT cell, CAST((count(*) * 7 + 9) // 10 AS BIGINT) AS n_keep
         |  FROM asg GROUP BY cell),
         |r AS (SELECT vec_id, cell, d_u,
         |  CAST(row_number() OVER (PARTITION BY cell ORDER BY d_u DESC, vec_id)
         |    AS BIGINT) AS rnk
         |  FROM asg)
         |SELECT vec_id, cell, d_u, rnk,
         |  CAST(CASE WHEN rnk <= n_keep THEN 1 ELSE 0 END AS BIGINT) AS kept,
         |  n_keep
         |FROM r JOIN nk USING (cell)""".stripMargin) { (s, d) =>
      Pruning.protoPrune(Tables.embeddings(s, d), "vec_id", "embedding",
        cents, keepNum = 7, keepDen = 10)
    })
}
