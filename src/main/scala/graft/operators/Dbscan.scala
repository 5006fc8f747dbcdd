package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN) over 2-D points ([[cluster]]) and
  * n-dim embedding vectors ([[clusterVectors]]) — the HDBSCAN slot of
  * the reference's transform arg-parser
  * (convml_data/pipeline/embeddings/transforms.py:87-102 parses
  * `min_cluster_size`/`min_samples` for a density model; seeded KMeans
  * stood in until now).
  *
  * Distributed shape (100 TB-safe):
  *  - ε-neighbor candidate generation is the Regrid/Similarity bin-join:
  *    snap points to an eps-sized grid, explode each point to its 3x3
  *    neighbor cells, equi-join on the cell id — every true ε-pair falls
  *    in some adjacent cell, so the exact distance filter runs on
  *    candidates only (never all pairs; shuffle key is an integer cell).
  *  - core points = ε-degree >= minPts (degree counts the point itself,
  *    the standard DBSCAN convention) — one groupBy.
  *  - clusters = connected components over CORE-CORE ε-edges via the
  *    O(log n) alternating-star recurrence ([[Dedup.connectedComponentsAltStar]]);
  *    the cluster label is the min core id, deterministic and
  *    oracle-reproducible.
  *  - border points (non-core with a core ε-neighbor) adopt the MINIMUM
  *    neighbor cluster label (deterministic tie-break); the rest is
  *    noise, labeled -1.
  *
  * Output: (pid, cluster, is_core) — one row per input point. */
object Dbscan {

  def cluster(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Double, minPts: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(eps > 0, "eps must be positive")
    val eps2 = eps * eps
    val pts = points.select(
      col(idCol).cast("long").as("pid"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val binnedC = graft.core.Caching.acquire(pts
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long")))
    val binned = binnedC.ds

    // probe side: each point visits its 3x3 cell neighborhood; build side
    // keeps the home cell only, so every unordered pair meets exactly in
    // the build point's home cell
    val offsets = array((-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj")))): _*)
    val probes = binned.select(
      col("pid").as("a_id"), col("x").as("ax"), col("y").as("ay"),
      explode(offsets).as("o"), col("cx"), col("cy"))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.di")).as("jcx"), (col("cy") + col("o.dj")).as("jcy"))
    val build = binned.select(
      col("pid").as("b_id"), col("x").as("bx"), col("y").as("by"),
      col("cx").as("jcx"), col("cy").as("jcy"))
    val dist2: Column =
      (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    // ε-pairs, self included (degree counts the point itself)
    val pairsC = graft.core.Caching.acquire(probes.join(build, Seq("jcx", "jcy"))
      .where(dist2 <= eps2)
      .select(col("a_id"), col("b_id")))

    val out = labelFromPairs(pts.select(col("pid")), pairsC.ds, minPts, checkpointDir)
    binnedC.release(); pairsC.release()
    out
  }

  /** DBSCAN over n-dim vectors (the embedding-space form the reference's
    * transform arg-parser wants a density model for —
    * convml_data/pipeline/embeddings/transforms.py:87-102 parses
    * `min_cluster_size`/`min_samples` over (tile_id, emb_dim) data).
    *
    * Candidate generation stays an EXACT integer-cell equi-join: bin on
    * the first `binDims` coordinates with eps-sized cells and explode the
    * probe side over the 3^binDims neighbor cells. Any true ε-pair is
    * within eps on EVERY coordinate, hence within one cell on each binned
    * coordinate — so the blocking is lossless for any binDims (the 2-D
    * [[cluster]] is the binDims = dims = 2 special case), unlike
    * LSH/IVF buckets which can drop true pairs. binDims is capped at 3
    * (27 neighbor cells); for anisotropic data, rotate the most-spread
    * directions to the front (e.g. PCA from Transforms) before calling.
    * The exact distance (a left-to-right squared-diff fold, restatable
    * in SQL) runs on candidates only — never all pairs. */
  def clusterVectors(points: DataFrame, idCol: String, vecCol: String,
      eps: Double, minPts: Int, binDims: Int = 2,
      checkpointDir: Option[String] = None): DataFrame = {
    require(eps > 0, "eps must be positive")
    require(binDims >= 1 && binDims <= 3,
      s"binDims must be in 1..3 (3^binDims neighbor cells), got $binDims")
    val eps2 = eps * eps
    val pts = points.select(col(idCol).cast("long").as("pid"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))
    val (joined, dist2, binnedC) = candidateJoin(pts, eps, binDims)
    val pairsC = graft.core.Caching.acquire(joined
      .where(dist2 <= eps2)
      .select(col("a_id"), col("b_id")))

    val out = labelFromPairs(pts.select(col("pid")), pairsC.ds, minPts, checkpointDir)
    binnedC.release(); pairsC.release()
    out
  }

  /** Shared eps-cell candidate join over (pid, vec: array<double>) rows:
    * bin the first binDims coordinates into eps cells, probe side visits
    * its 3^binDims cell neighborhood, build side keeps the home cell —
    * every unordered pair meets exactly once, as an integer equi-join.
    * Returns (joined frame with a_id/av/b_id/bv, the dist2 column, and
    * the binned frame's cache handle for the caller to release). */
  private[graft] def candidateJoin(pts: DataFrame, eps: Double, binDims: Int)
      : (DataFrame, Column, graft.core.Caching.Cached[org.apache.spark.sql.Row]) = {
    val cellCols = (0 until binDims).map(i =>
      floor(element_at(col("vec"), i + 1) / eps).cast("long").as(s"c$i"))
    val binnedC = graft.core.Caching.acquire(
      pts.select(col("pid") +: col("vec") +: cellCols: _*))
    val binned = binnedC.ds
    val offsets = (0 until binDims).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(s => Seq(-1, 0, 1).map(s :+ _))
    }
    val offCol = array(offsets.map(o =>
      struct(o.zipWithIndex.map { case (v, i) => lit(v.toLong).as(s"d$i") }: _*)): _*)
    val probes = binned
      .select(col("pid").as("a_id") +: col("vec").as("av") +:
        explode(offCol).as("o") +: (0 until binDims).map(i => col(s"c$i")): _*)
      .select(col("a_id") +: col("av") +:
        (0 until binDims).map(i => (col(s"c$i") + col("o").getField(s"d$i")).as(s"jc$i")): _*)
    val build = binned.select(col("pid").as("b_id") +: col("vec").as("bv") +:
      (0 until binDims).map(i => col(s"c$i").as(s"jc$i")): _*)
    // native codegen'd loop (graft.plans.SqL2Dist) — bit-identical to
    // aggregate(zip_with(av, bv, (x,y) => (x-y)*(x-y)), 0.0, +), which
    // paid interpreted lambda eval per dimension per candidate PAIR
    val dist2: Column = graft.plans.SqL2Dist.sqL2Col(col("av"), col("bv"))
    (probes.join(build, (0 until binDims).map(i => s"jc$i")), dist2, binnedC)
  }

  /** Shared labeling tail: ε-pairs (self-pairs included) -> (pid, cluster,
    * is_core). Core = degree >= minPts; clusters = alt-star components
    * over core-core edges labeled by min core id; borders adopt the min
    * neighbor cluster; everything else is noise (-1). */
  private def labelFromPairs(ptIds: DataFrame, pairs: DataFrame, minPts: Int,
      checkpointDir: Option[String]): DataFrame = {
    val coreC = graft.core.Caching.acquire(
      pairs.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= minPts)
        .select(col("a_id").as("pid")))
    val core = coreC.ds

    val coreEdges = pairs
      .join(core.withColumnRenamed("pid", "a_id"), "a_id")
      .join(core.withColumnRenamed("pid", "b_id"), "b_id")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    val comp = Dedup.connectedComponentsAltStar(coreEdges, "a_id", "b_id",
      checkpointDir = checkpointDir)
    // singleton cores (no core neighbor) label themselves
    val coreLabelsC = graft.core.Caching.acquire(core
      .join(comp.withColumnRenamed("node", "pid"), Seq("pid"), "left")
      .select(col("pid"), coalesce(col("component"), col("pid")).as("cluster")))
    val coreLabels = coreLabelsC.ds

    // border: non-core with >=1 core ε-neighbor -> min neighbor cluster
    val nonCorePairs = pairs
      .where(col("a_id") =!= col("b_id"))
      .join(core.withColumnRenamed("pid", "a_id"), Seq("a_id"), "left_anti")
    val border = nonCorePairs
      .join(coreLabels.withColumnRenamed("pid", "b_id"), "b_id")
      .groupBy(col("a_id")).agg(min(col("cluster")).as("cluster"))
      .select(col("a_id").as("pid"), col("cluster"))

    val labeled = coreLabels.withColumn("is_core", lit(true))
      .union(border.withColumn("is_core", lit(false)))
    val noise = ptIds
      .join(labeled.select(col("pid")), Seq("pid"), "left_anti")
      .select(col("pid"), lit(-1L).as("cluster"), lit(false).as("is_core"))
    // materialize (eager truncation — reliable checkpoint when
    // checkpointDir is set, else localCheckpoint) so every persisted
    // intermediate can be released before returning — the output is one
    // small row per point; the heavy frames must not outlive the call
    val out = Checkpointing.truncate(labeled.union(noise), checkpointDir)
    coreC.release(); coreLabelsC.release()
    out
  }
}
