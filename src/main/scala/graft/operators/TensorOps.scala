package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long (one row per pixel) <-> tensor (one Array-valued row per scene)
  * converters — the dual raster representation of SURVEY §7.4.5.
  *
  * Rule of thumb at 100 TB: tensor form for per-scene vectorized math
  * (avoids 10^8-row explosions per scene), long form where relational ops
  * pay off (regrid weights join, binning, aux joins). Conversions are
  * loss-free including NaN sentinels: NaN survives array round-trips, and
  * the `-1` sentinel convention (goes16/utils.py:23-26) is handled by
  * [[sentinelToNan]] / [[nanToSentinel]].
  *
  * Row-major layout: values(i) = pixel(y = i div nx, x = i mod nx).
  */
object TensorOps {

  /** Long (scene_id, y, x, value) -> tensor (scene_id, ny, nx, values).
    * One hash aggregation; ordering is imposed by sorting (y,x)-keyed
    * structs inside the group, so the result is shuffle-order-independent.
    */
  def longToTensor(px: DataFrame, sceneCol: String = "scene_id"): DataFrame =
    px.groupBy(col(sceneCol))
      .agg(
        (max(col("y")) + 1).cast("int").as("ny"),
        (max(col("x")) + 1).cast("int").as("nx"),
        sort_array(collect_list(struct(col("y"), col("x"), col("value")))).as("__cells"))
      .withColumn("values", transform(col("__cells"), c => c.getField("value")))
      .drop("__cells")

  /** Long -> CHUNKED tensor: one row per (scene, chunk_j, chunk_i) with a
    * row-major sub-raster of at most chunk×chunk elements.
    *
    * [[longToTensor]] puts a whole scene in one row — fine after a crop
    * (the reference also crops first), but a full-disk GOES ch2 scene
    * (21696², ~4.7·10⁸ doubles) would blow past JVM single-row limits.
    * Chunking makes the bounded-row invariant structural: no row ever
    * holds more than chunk² values no matter the scene size, the group
    * key (scene, chunk_j, chunk_i) spreads a scene across the cluster,
    * and global pixel coordinates reconstruct from the chunk key alone
    * (x = chunk_i·chunk + lx), so chunks never need scene-level metadata.
    * Edge chunks are ragged (cny/cnx < chunk) and round-trip exactly. */
  def longToChunkedTensor(px: DataFrame, chunk: Int, sceneCol: String = "scene_id"): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    px.withColumn("chunk_j", expr(s"y div $chunk").cast("long"))
      .withColumn("chunk_i", expr(s"x div $chunk").cast("long"))
      .withColumn("__ly", (col("y") - col("chunk_j") * chunk).cast("int"))
      .withColumn("__lx", (col("x") - col("chunk_i") * chunk).cast("int"))
      .groupBy(col(sceneCol), col("chunk_j"), col("chunk_i"))
      .agg(
        (max(col("__ly")) + 1).cast("int").as("cny"),
        (max(col("__lx")) + 1).cast("int").as("cnx"),
        sort_array(collect_list(struct(col("__ly"), col("__lx"), col("value")))).as("__cells"))
      .withColumn("values", transform(col("__cells"), c => c.getField("value")))
      .drop("__cells")
  }

  /** Chunked tensor -> long; inverse of [[longToChunkedTensor]]. */
  def chunkedTensorToLong(t: DataFrame, chunk: Int, sceneCol: String = "scene_id"): DataFrame =
    t.select(col(sceneCol), col("chunk_j"), col("chunk_i"), col("cnx"),
        posexplode(col("values")).as(Seq("pos", "value")))
      .select(col(sceneCol),
        (col("chunk_j") * chunk + expr("pos div cnx")).cast("int").as("y"),
        (col("chunk_i") * chunk + pmod(col("pos"), col("cnx"))).cast("int").as("x"),
        col("value"))

  /** Tensor (scene_id, ny, nx, values) -> long (scene_id, y, x, value). */
  def tensorToLong(t: DataFrame, sceneCol: String = "scene_id"): DataFrame =
    t.select(col(sceneCol), col("nx"), posexplode(col("values")).as(Seq("pos", "value")))
      .select(col(sceneCol),
        expr("pos div nx").cast("int").as("y"),
        pmod(col("pos"), col("nx")).cast("int").as("x"),
        col("value"))

  /** C9: sentinel -> NaN (goes16/utils.py:23-26). */
  def sentinelToNan(v: Column, sentinel: Double = -1.0): Column =
    when(v === sentinel, lit(Double.NaN)).otherwise(v)

  /** C9: NaN -> sentinel (flow/calc.py:178). */
  def nanToSentinel(v: Column, sentinel: Double = -1.0): Column =
    when(isnan(v), lit(sentinel)).otherwise(v)

  /** J6: gather pixels under tile bboxes via spatial-cell bucketing —
    * the range join becomes an equi-join on cell ids.
    *
    * `px`: (scene_id, x, y, value) with x/y in meters;
    * `tiles`: (scene_id, tile_id, x0, y0) with tile extent `tileSizeM`.
    * Each tile row explodes to the cells its bbox covers (cellSize >=
    * tileSize => <= 4 cells/tile), pixels carry their own cell id, and the
    * join key (scene_id, cell) co-locates only nearby pixels — no O(N·M)
    * scan, shuffle bounded by data size. Exact bbox filter applied after.
    */
  def gatherTiles(px: DataFrame, tiles: DataFrame, tileSizeM: Double,
      cellSizeM: Double): DataFrame = {
    require(cellSizeM >= tileSizeM, "cell must cover a tile so 2x2 cells suffice")
    val t = tiles
      .withColumn("__c0x", floor(col("x0") / cellSizeM).cast("long"))
      .withColumn("__c0y", floor(col("y0") / cellSizeM).cast("long"))
      .withColumn("cx", explode(array(col("__c0x"), col("__c0x") + 1)))
      .withColumn("cy", explode(array(col("__c0y"), col("__c0y") + 1)))
      .drop("__c0x", "__c0y")
    val p = px
      .withColumn("cx", floor(col("x") / cellSizeM).cast("long"))
      .withColumn("cy", floor(col("y") / cellSizeM).cast("long"))
    p.join(t, Seq("scene_id", "cx", "cy"))
      .where(col("x") >= col("x0") && col("x") < col("x0") + tileSizeM
        && col("y") >= col("y0") && col("y") < col("y0") + tileSizeM)
      .drop("cx", "cy")
  }
}
