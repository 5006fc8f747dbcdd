package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product-quantization queries over `embeddings`: corpus encoding
  * (q116) and ADC top-k search from codes alone (q117). The DuckDB
  * oracle interpolates the identical formula-deterministic codebook and
  * replays the same left-fold IEEE arithmetic, so codes, distances, and
  * ranks all hash-match. */
object PqQueries {

  /** The codebook as a DuckDB list literal — exact 2-dp quarters, which
    * DECIMAL(3,2)→DOUBLE converts exactly. */
  private val CB_SQL: String =
    Pq.codebook.map(sk => sk.map(kj =>
      kj.map(v => f"$v%.2f").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** Shared CTE: per-vector M x K squared-subdistance matrix. */
  private val DMAT_CTE: String =
    s"""cbt AS (SELECT $CB_SQL AS cb),
       |dm AS (
       |  SELECT vec_id,
       |    [[ list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        [ (CAST(embedding[s*${Pq.SubDim}+j] AS DOUBLE) - cb[s+1][k+1][j])
       |          * (CAST(embedding[s*${Pq.SubDim}+j] AS DOUBLE) - cb[s+1][k+1][j])
       |          FOR j IN range(1, ${Pq.SubDim + 1})]),
       |        (a, b) -> a + b)
       |      FOR k IN range(0, ${Pq.K})] FOR s IN range(0, ${Pq.M})] AS dmat
       |  FROM embeddings, cbt),
       |codes AS (
       |  SELECT vec_id,
       |    [list_position(ds, list_min(ds)) - 1 FOR ds IN dmat] AS codes
       |  FROM dm)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ---- PQ encode ------------------------------------------------------
    // 64-dim float -> 8 code columns; first-minimum tie-break.
    QueryDef.sqlBacked(
      "q116_pq_encode",
      s"""WITH $DMAT_CTE
         |SELECT vec_id,
         |  ${(0 until Pq.M).map(s =>
             s"CAST(codes[${s + 1}] AS BIGINT) AS c$s").mkString(",\n  ")}
         |FROM codes""".stripMargin) { (s, d) =>
      Pq.encodeDf(Tables.embeddings(s, d), "vec_id", "embedding")
    },

    // ---- ADC top-k search ----------------------------------------------
    // Probes (vec_id % 97) search the coded corpus via their lookup
    // tables; ranked by (micro-scaled ADC distance, neighbor id).
    QueryDef.sqlBacked(
      "q117_pq_adc_topk",
      s"""WITH $DMAT_CTE,
         |probes AS (
         |  SELECT vec_id AS probe_id, flatten(dmat) AS lut
         |  FROM dm WHERE vec_id % 97 = 0),
         |scored AS (
         |  SELECT probe_id, vec_id AS nid,
         |    CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |      [ lut[s*${Pq.K} + codes[s+1] + 1] FOR s IN range(0, ${Pq.M})]),
         |      (a, b) -> a + b) * 1e6) AS BIGINT) AS adc_u
         |  FROM codes, probes WHERE vec_id != probe_id)
         |SELECT probe_id,
         |  CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adc_u, nid)
         |    AS BIGINT) AS rnk,
         |  nid AS neighbor_id, adc_u
         |FROM scored QUALIFY rnk <= 10""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Pq.adcTopK(emb, emb.where(col("vec_id") % 97 === 0), k = 10)
    })
}
