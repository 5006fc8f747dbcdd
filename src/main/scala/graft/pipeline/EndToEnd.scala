package graft.pipeline

import graft.core.Domain
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §7.2's minimum end-to-end slice: the LES-style pipeline wired
  * through every layer with zero external services.
  *
  *   gridded source -> scene catalog (S8+A3) -> time filter (F1/F2) ->
  *   crop (P2) -> weights regrid (R1 bilinear) -> triplet specs (T1-T5,
  *   seeded) -> tile gather (J6) -> per-tile mean of an aux field matched
  *   by as-of join (J1+G1) -> aggregated output.
  *
  * Inputs are long-format pixels (scene_id, time, x, y, value) on a
  * source grid and an aux timeline (aux_time, aux_value); the synthetic
  * test fixture uses FIXTURES.md §3's hand-checkable field. Each stage is
  * the already-tested operator — this object only wires them, which is
  * exactly the reference's luigi graph collapsed into one lazy plan.
  */
object EndToEnd {

  final case class Config(
      domain: Domain,
      srcGrid: Regrid.GridDef,
      dstGrid: Regrid.GridDef,
      tileSizeM: Double,
      nTriplets: Int,
      dtAuxUs: Long,
      seed: Long = 42L)

  /** Returns (tileSpecs, perTileStats): per-tile pixel means on the
    * regridded field joined with the as-of-matched aux value. */
  def run(spark: SparkSession, pixels: DataFrame, aux: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    // --- scene catalog (A3): one row per scene with its timestamp -------
    val scenes = pixels.select(col("scene_id"), col("time")).distinct()

    // --- time filter (F1): plain predicate; full extent for the fixture -
    val keptScenes = scenes

    // --- crop (P2) + regrid (R1): bilinear onto the analysis grid -------
    val srcIdx = pixels
      // round, not truncate: pixels sit at cell centers, so the index is
      // an exact integer up to FP error — cast("int") would mis-bin a
      // 1.9999999999999998 into cell 1
      .withColumn("src_i", round((col("x") - cfg.srcGrid.x0) / cfg.srcGrid.dx - 0.5).cast("int"))
      .withColumn("src_j", round((col("y") - cfg.srcGrid.y0) / cfg.srcGrid.dy - 0.5).cast("int"))
      .where(col("src_i").between(0, cfg.srcGrid.nx - 1)
        && col("src_j").between(0, cfg.srcGrid.ny - 1))
    val weights = Regrid.bilinearWeights(spark, cfg.srcGrid, cfg.dstGrid)
    val regridded = Regrid.applyWeights(srcIdx, weights, Seq("scene_id", "time"))
      .withColumn("x", lit(cfg.dstGrid.x0) + (col("dst_i") + 0.5) * cfg.dstGrid.dx)
      .withColumn("y", lit(cfg.dstGrid.y0) + (col("dst_j") + 0.5) * cfg.dstGrid.dy)

    // --- triplet sampling (T1-T5): deterministic, repartition-stable ----
    val collections = keptScenes
      .withColumn("collection", Triplets.splitScenes(col("scene_id"), cfg.seed,
        Seq("train" -> 0.8, "study" -> 0.2)))
    val triplets = spark.range(0, cfg.nTriplets).select(col("id").as("triplet_id"))
      .withColumn("collection", lit("train"))
    val paired = Triplets.pairScenes(
      collections.where(col("collection") === "train"), triplets, cfg.seed)
    val specs = Triplets.tileSpecs(paired, cfg.domain, cfg.tileSizeM, 0.1, cfg.seed)
      .withColumn("tile_id", Triplets.tripletTileId(col("triplet_id"), col("tile_type")))
      // tile origin = center - size/2 (gather expects origins)
      .withColumn("x0", col("x") - cfg.tileSizeM / 2)
      .withColumn("y0", col("y") - cfg.tileSizeM / 2)

    // --- tile gather (J6): cell-bucketed pixel/tile equi-join -----------
    val gathered = TensorOps.gatherTiles(
      regridded.select(col("scene_id"), col("time"), col("dst_i"), col("dst_j"),
        col("x"), col("y"), col("value")),
      specs.select(col("scene_id"), col("tile_id"), col("x0"), col("y0")),
      cfg.tileSizeM, cellSizeM = cfg.tileSizeM)

    // --- per-tile reduce (G1) -------------------------------------------
    val tileStats = gathered.groupBy(col("scene_id"), col("time"), col("tile_id"))
      .agg(avg(col("value")).as("tile_mean"), count(lit(1)).as("n_px"))

    // --- aux as-of join (J1): nearest aux sample within dt/2 ------------
    val withAux = AsOfJoin.singleScenePerAuxTime(
      tileStats, aux, "time", "aux_time", cfg.dtAuxUs, Seq("scene_id", "tile_id"))

    (specs, withAux)
  }

  /** SURVEY §3.3's flow: regridded scenes -> sliding-window tile specs
    * (W1) -> tile gather -> batched model inference (M1) -> embedding
    * aggregation (O3) -> PCA transform (M3) -> aux co-location (G1+J4) ->
    * 2-D binned statistics (G6) of an embedding component vs the aux
    * scalar. Returns (embeddings+aux, binned stats).
    *
    * `regridded` must carry (scene_id, time, dst_i, dst_j, value) on an
    * (nx, ny) destination grid; `auxPx` is a long-format aux field on the
    * same grid.
    */
  def embeddingsFlow(
      spark: SparkSession,
      regridded: DataFrame,
      auxPx: DataFrame,
      gridNx: Int, gridNy: Int,
      tileN: Int, step: Int,
      model: graft.embeddings.Inference.TileModel,
      pcaComponents: Int): (DataFrame, DataFrame) = {
    import graft.embeddings.{Inference, Transforms}

    // W1: sliding-window tile specs per scene (pure index math)
    val scenes = regridded.select(col("scene_id"), col("time")).distinct()
      .withColumn("nx", lit(gridNx)).withColumn("ny", lit(gridNy))
    val specs = Tiler.tileSpecs(scenes, col("nx"), col("ny"), tileN, step)
      .withColumn("gtile_id", Tiler.globalTileId(col("scene_id"), col("tile_id")))

    // gather: integer-index range join (J6 in index space — equi-join on
    // the tile row after an explode over covered tiles is overkill here;
    // tiles overlap, so join pixels to specs on scene + index bounds
    // via the bucketed cell trick in index units)
    val px = regridded
      .withColumn("x", col("dst_i").cast("double"))
      .withColumn("y", col("dst_j").cast("double"))
    val tiles = specs.select(col("scene_id"), col("gtile_id").as("tile_id"),
      col("i0").cast("double").as("x0"),
      // gather uses origin+size in the same units; undo the Tiler y-flip
      (lit(gridNy) - (col("j0") + tileN)).cast("double").as("y0"))
    val gathered = TensorOps.gatherTiles(
      px.select(col("scene_id"), col("time"), col("x"), col("y"), col("value")),
      tiles, tileSizeM = tileN.toDouble, cellSizeM = tileN.toDouble)

    // tensor assembly + M1 inference (per-partition batched model)
    val tensors = gathered.groupBy(col("scene_id"), col("time"), col("tile_id"))
      .agg(sort_array(collect_list(struct(col("y"), col("x"), col("value")))).as("__c"))
      .withColumn("values", transform(col("__c"), c => c.getField("value")))
      .drop("__c")
    val embs = Inference.embedTiles(tensors, "tile_id", "values", model)

    // M3: PCA over the aggregated embeddings, stamped with the
    // reference's transform-identifier manifest (transforms.py:120-139)
    val pca = Transforms.fitPca(embs, "emb", pcaComponents)
    val transformArgs = s"n_components=$pcaComponents"
    val reduced = Transforms.applyPca(embs, pca, "emb", "emb_pca")
      .withColumn("transform_name",
        lit(Transforms.transformIdentifier("pca", transformArgs)))

    // G1+J4: per-tile aux reduction joined onto embeddings
    val auxTiles = TensorOps.gatherTiles(
      auxPx.select(col("scene_id"), col("time"),
        col("dst_i").cast("double").as("x"), col("dst_j").cast("double").as("y"),
        col("value")),
      tiles, tileSizeM = tileN.toDouble, cellSizeM = tileN.toDouble)
      .groupBy(col("tile_id"))
      .agg(avg(col("value")).as("aux_mean"))
    val joined = reduced.join(auxTiles, "tile_id")
      .withColumn("emb0", element_at(col("emb_pca"), 1))

    // G6: binned stats of first PCA component vs aux scalar
    val binned = Binning.bin2d(joined,
      col("emb0"), 0.5, col("aux_mean"), 0.5, col("emb0"), minCount = 1)
    (joined, binned)
  }

  /** Convenience: run + produce tile PNGs from the same gather. */
  def runWithImages(spark: SparkSession, pixels: DataFrame, aux: DataFrame,
      cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val (specs, stats) = run(spark, pixels, aux, cfg)
    // re-derive the gather for the image stage (plans are lazy; Catalyst
    // shares scan-side work, and a production caller would persist)
    val srcIdx = pixels
      // round, not truncate: pixels sit at cell centers, so the index is
      // an exact integer up to FP error — cast("int") would mis-bin a
      // 1.9999999999999998 into cell 1
      .withColumn("src_i", round((col("x") - cfg.srcGrid.x0) / cfg.srcGrid.dx - 0.5).cast("int"))
      .withColumn("src_j", round((col("y") - cfg.srcGrid.y0) / cfg.srcGrid.dy - 0.5).cast("int"))
      .where(col("src_i").between(0, cfg.srcGrid.nx - 1)
        && col("src_j").between(0, cfg.srcGrid.ny - 1))
    val weights = Regrid.bilinearWeights(spark, cfg.srcGrid, cfg.dstGrid)
    val regridded = Regrid.applyWeights(srcIdx, weights, Seq("scene_id", "time"))
      .withColumn("x", lit(cfg.dstGrid.x0) + (col("dst_i") + 0.5) * cfg.dstGrid.dx)
      .withColumn("y", lit(cfg.dstGrid.y0) + (col("dst_j") + 0.5) * cfg.dstGrid.dy)
    val gathered = TensorOps.gatherTiles(
      regridded.select(col("scene_id"), col("time"), col("dst_i"), col("dst_j"),
        col("x"), col("y"), col("value")),
      specs.select(col("scene_id"), col("tile_id"), col("x0"), col("y0")),
      cfg.tileSizeM, cellSizeM = cfg.tileSizeM)
    (specs, stats, tileImages(gathered))
  }

  /** Tile-image stage (S12/C7/C8): min-max-normalize each gathered tile's
    * pixels, replicate to grayscale RGB, PNG-encode — one binary row per
    * tile, the reference's per-tile PNG output re-expressed as a
    * binary-column sink. `gathered` = output of TensorOps.gatherTiles
    * with integer dst grid indices (dst_i, dst_j). */
  def tileImages(gathered: DataFrame): DataFrame = {
    import graft.functions.ImageOps
    val tensors = gathered
      .groupBy(col("scene_id"), col("tile_id"))
      .agg(
        (max(col("dst_j")) - min(col("dst_j")) + 1).cast("int").as("ny"),
        (max(col("dst_i")) - min(col("dst_i")) + 1).cast("int").as("nx"),
        sort_array(collect_list(struct(col("dst_j"), col("dst_i"), col("value")))).as("__cells"))
      .withColumn("vals", transform(col("__cells"), c => c.getField("value")))
      .drop("__cells")
    val gray = ImageOps.minMaxScaleArr(col("vals"))
    tensors
      .withColumn("rgb", ImageOps.stackRgb(gray, gray, gray))
      .withColumn("png", ImageOps.encodePng(col("rgb"), col("ny"), col("nx")))
      .select(col("scene_id"), col("tile_id"), col("ny"), col("nx"),
        length(col("png")).as("png_bytes"), col("png"))
  }
}
