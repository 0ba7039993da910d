package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.multimodal.Media

/** Multimodal pipeline surface: binary payload columns + stubbed batch
  * decode (see [[graft.multimodal.Media]]). The oracle checks the
  * Spark-side plumbing end-to-end — payload construction, per-partition
  * decode, feature projection, rollup — against DuckDB recomputing the
  * same deterministic fake features from the source text bytes. */
object MultimodalOps {

  /** Feature rollup per (kind, source) after batched decode. The plan
    * never shuffles the binary payload: features are extracted first,
    * then the narrow rows aggregate. */
  private def m01(s: SparkSession, d: String): DataFrame = {
    val media = Media.mediaFromDocuments(documents(s, d))
    Media.decodeFeatures(media).toDF()
      .groupBy(col("kind"), col("source"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width")).as("sum_width"),
        sum(col("n_frames")).as("sum_frames"),
        countDistinct(col("checksum")).as("n_distinct"))
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "m01_media_features" -> m01 _,
  )

  val oracle: ListMap[String, String] = ListMap(
    "m01_media_features" ->
      """SELECT ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
        |  source,
        |  COUNT(*) AS n_media,
        |  SUM(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  SUM(octet_length(encode(text)) % 640)::BIGINT AS sum_width,
        |  SUM(CASE WHEN ['image','audio','video'][(doc_id % 3 + 1)::INT] = 'video'
        |       THEN octet_length(encode(text)) % 24 + 1 ELSE 1 END)::BIGINT AS sum_frames,
        |  COUNT(DISTINCT md5(text)) AS n_distinct
        |FROM documents GROUP BY 1, 2""".stripMargin,
  )
}
