package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scene assembly: group per-input file lists by timestamp and keep only
  * timestamps for which ALL expected inputs are present, then synthesize
  * scene ids.
  *
  * Reference: convml_data/pipeline/scene_sources.py:31-93
  * (merge_multiinput_sources / create_scenes_from_input_queries) and
  * :96-156 (GenerateSceneIDs with id format `{source}__{yyyyMMddHHmm}`,
  * make_scene_id at :21-28).
  *
  * Scale design: a single hash aggregation on the time key with map-side
  * partial aggregation — one shuffle, no join. The completeness gate
  * (`all N inputs present`) is `count(distinct input) = N` folded into the
  * same aggregation.
  */
object SceneAssembly {

  /** A1/A2: union'd per-input listings -> complete scenes only.
    * Input schema: (timeCol, inputCol, fileCol). Output: one row per
    * complete timestamp with an input->file map.
    */
  def assembleScenes(
      files: DataFrame,
      timeCol: String,
      inputCol: String,
      fileCol: String,
      nInputs: Int): DataFrame =
    files
      .groupBy(col(timeCol))
      .agg(
        map_from_entries(sort_array(collect_list(struct(col(inputCol), col(fileCol)))))
          .as("inputs"),
        countDistinct(col(inputCol)).as("__n"))
      .where(col("__n") === nInputs)
      .drop("__n")

  /** C1: scene id codec `{source}__{yyyyMMddHHmm}`
    * (scene_sources.py:21-28). */
  def makeSceneId(source: String, t: Column): Column =
    concat(lit(source), lit("__"), date_format(t, "yyyyMMddHHmm"))

  /** Inverse codec: parse the timestamp back out of a scene id. */
  def parseSceneTime(sceneId: Column): Column =
    to_timestamp(substring_index(sceneId, "__", -1), "yyyyMMddHHmm")

  /** O5: scene-id regex filter (pipeline/utils.py:42-49). */
  def sceneFilter(scenes: DataFrame, idCol: String, pattern: String): DataFrame =
    scenes.where(col(idCol).rlike(pattern))
}
