package graft.multimodal

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite
import Media._

class MediaSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("media records carry binary payloads with typed metadata") {
    val media = mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.head()
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.payload.nonEmpty)
    assert(media.count() == docs.count())
  }

  test("batched decode produces deterministic features; payload pruned from output") {
    val feats = decodeFeatures(mediaFromDocuments(docs))
    assert(!feats.schema.fieldNames.contains("payload"))
    val f = feats.orderBy("media_id").head()
    // deterministic fake: dimensions derived from byte length
    assert(f.width == (f.n_bytes % 640).toInt)
    assert(f.checksum.length == 32)
    // video gets frame sampling, stills get 1
    val byKind = feats.groupBy("kind").agg(min("n_frames"), max("n_frames"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(byKind("image") == ((1, 1)))
    assert(byKind.get("video").forall(_._2 >= 1))
  }

  test("decode runs per-partition (partition count preserved, no shuffle)") {
    val media = mediaFromDocuments(docs).repartition(3)
    val feats = decodeFeatures(media)
    assert(feats.rdd.getNumPartitions == 3)
  }

  test("resize truncates oversized payloads only") {
    val media = mediaFromDocuments(docs)
    val resized = resize(media, 100)
    assert(resized.collect().forall(_.payload.length <= 100))
    val small = resize(media, 1 << 20).collect().map(_.payload.length).sum
    val orig = media.collect().map(_.payload.length).sum
    assert(small == orig)
  }

  test("feature extraction then aggregate: binary never enters the shuffle") {
    val plan = decodeFeatures(mediaFromDocuments(docs)).toDF()
      .groupBy("kind").agg(sum("n_bytes"))
      .queryExecution.executedPlan.toString
    // the row that would shuffle is the SerializeFromObject output of the
    // decode — it must carry features only, never the binary payload
    val serialized = plan.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"))
  }
}
