package graft

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** The refined-centroid index mode (`spark.graft.ann.refinedCentroids`):
  * s05/s17 build and serve from the s16 Lloyd refinement of the seed
  * centroids. The clustering exists to improve the index — so the spec
  * demands it actually does (recall vs the brute-force truth), and that
  * the iterated loop's plan stays flat in round count (lineage
  * truncation). */
class AnnRefinementSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private val Flag = "spark.graft.ann.refinedCentroids"

  private def topPairs(q: String): Set[(Long, Long)] =
    SparkEntry.queries(q)(spark, sf)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect().toSet

  test("s16-refined centroids serve s17 with recall >= the seed quantizer " +
    "(and a valid top-3 per query) at sf0.01") {
    val truth = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect().toSet
    val seedTp = (topPairs("s17_ivf_pq_rerank") & truth).size
    spark.conf.set(Flag, "true")
    try {
      val refined = topPairs("s17_ivf_pq_rerank")
      val refinedTp = (refined & truth).size
      assert(refinedTp >= seedTp,
        s"Lloyd refinement LOST recall: $refinedTp true positives vs " +
          s"$seedTp from the raw seeds (truth ${truth.size})")
      // still a well-formed serving result: 3 ranked rows per query
      val perQuery = refined.groupBy(_._1).view.mapValues(_.size).toMap
      assert(perQuery.values.forall(_ == 3), s"ragged top-3: $perQuery")
    } finally spark.conf.unset(Flag)
  }

  test("the refinedCentroids flag actually swaps the quantizer for BOTH " +
    "build (s05) and serving (s17)") {
    def outputs(): (Set[(Long, Long)], Set[(Long, Long)]) =
      (topPairs("s05_ann_ivf"), topPairs("s17_ivf_pq_rerank"))
    val (seedIvf, seedServe) = outputs()
    spark.conf.set(Flag, "true")
    try {
      val (refIvf, refServe) = outputs()
      // refined sum-centroids relocate list boundaries — if either query
      // ignored the flag its output would be identical to seed mode
      // (both read ONE ivfCentroids definition, so partial adoption —
      // the drift the dead helpers used to permit — shows up here)
      assert(refIvf != seedIvf,
        "s05 ignored refinedCentroids — index build not rewired")
      assert(refServe != seedServe,
        "s17 ignored refinedCentroids — serving not rewired")
    } finally spark.conf.unset(Flag)
  }

  test("s18 cluster dedup: the keep flag is EXACTLY the same-cluster " +
    "smaller-id near-neighbour rule against s04's truth") {
    val out = SparkEntry.queries("s18_semantic_cluster_dedup")(spark, sf)
      .select(col("vec_id"), col("c_id"), col("keep"))
      .as[(Long, Long, Long)].collect()
    // one decision per embedding, binary
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    assert(out.forall(r => r._3 == 0L || r._3 == 1L))
    val cluster = out.map(r => r._1 -> r._2).toMap
    // truth: the corpus-wide exact pairs, restricted to co-clustered
    val s04 = SparkEntry.queries("s04_embedding_neardup")(spark, sf)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    val mustDrop = s04.filter { case (a, b) => cluster(a) == cluster(b) }
      .map(_._2).toSet
    out.foreach { case (id, _, keep) =>
      assert((keep == 0L) == mustDrop.contains(id),
        s"vec $id: keep=$keep but same-cluster smaller-id " +
          s"neighbour=${mustDrop.contains(id)}")
    }
    // the bargain is real on this data: some pair must be co-clustered
    assert(mustDrop.nonEmpty, "vacuous: no s04 pair was co-clustered")
  }

  test("s18 reads the shared quantizer: refinedCentroids moves its " +
    "cluster assignment") {
    def assignment(): Map[Long, Long] =
      SparkEntry.queries("s18_semantic_cluster_dedup")(spark, sf)
        .select(col("vec_id"), col("c_id"))
        .as[(Long, Long)].collect().toMap
    val seed = assignment()
    spark.conf.set(Flag, "true")
    val refined = try assignment() finally spark.conf.unset(Flag)
    assert(refined != seed,
      "s18 ignored refinedCentroids — not reading ivfCentroids")
  }

  test("the materialized ANN index serves bit-identically to the " +
    "in-memory build, in both seed and refined centroid modes") {
    import graft.queries.SimilarityOps
    def roundTrip(): (Set[(Long, Long, Long, Double)],
        Set[(Long, Long, Long, Double)]) = {
      val emb = SimilarityOps.annEmb(spark, sf)
      val built = SimilarityOps.buildAnnIndex(emb)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("query_id"), col("cand_id"), col("rank"), col("cos"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val direct = rows(SimilarityOps.serveAnnIndex(emb, built))
      val dir = java.nio.file.Files.createTempDirectory("annidx").toString
      graft.operators.AnnIndexStore.write(built, dir)
      val fromDisk = rows(SimilarityOps.serveAnnIndex(emb,
        graft.operators.AnnIndexStore.read(spark, dir)))
      (direct, fromDisk)
    }
    val (d1, s1) = roundTrip()
    assert(d1.nonEmpty && d1 == s1,
      "serving from the written index diverged from the in-memory build")
    spark.conf.set(Flag, "true")
    try {
      val (d2, s2) = roundTrip()
      assert(d2.nonEmpty && d2 == s2,
        "refined-mode serving diverged after the parquet round-trip")
      assert(d2 != d1, "refined index unexpectedly equals seed index")
    } finally spark.conf.unset(Flag)
  }

  test("incremental append under the frozen quantizer serves " +
    "bit-identically to a full rebuild") {
    import graft.queries.SimilarityOps
    val emb = SimilarityOps.annEmb(spark, sf).persist()
    try {
      // "old" corpus: vec_id < 300 — contains the queries (< 8) and the
      // 100–115 quantizer seeds, so build(old) freezes the same
      // quantizer as build(all); "delta": the 200 vectors above
      val old = emb.filter(col("vec_id") < 300)
      val delta = emb.filter(col("vec_id") >= 300)
      assert(old.count() > 0 && delta.count() > 0, "split fixture empty")
      val appended = SimilarityOps.appendToAnnIndex(
        SimilarityOps.buildAnnIndex(old), delta)
      val rebuilt = SimilarityOps.buildAnnIndex(emb)
      def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      // the appended index tables ARE the rebuild's, row for row
      assert(rows(appended("lists")) == rows(rebuilt("lists")),
        "inverted lists diverge from the full rebuild")
      assert(rows(appended("codes")) == rows(rebuilt("codes")),
        "PQ code words diverge from the full rebuild")
      // and serving from them is bit-identical
      val a = rows(SimilarityOps.serveAnnIndex(emb, appended))
      val b = rows(SimilarityOps.serveAnnIndex(emb, rebuilt))
      assert(a.nonEmpty && a == b,
        "append-then-serve diverges from rebuild-then-serve")
    } finally emb.unpersist()
  }

  test("s21 filtered kNN: full k per query, every hit from the allowed " +
    "label universe, and hits agree with s01 where labels permit") {
    val allowed = Set(1L, 3L, 5L, 7L)
    val rows = SparkEntry.queries("s21_filtered_knn")(spark, sf)
      .select("query_id", "cand_id", "label", "rank")
      .as[(Long, Long, Long, Long)].collect()
    // pre-filter semantics: k results per query despite the predicate
    assert(rows.length == 8 * 5, s"${rows.length} rows")
    rows.foreach { case (_, _, l, _) => assert(allowed(l), s"label $l") }
    rows.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._4).sorted.toSeq == (1L to 5L), g.toSeq.toString))
    // consistency with the unfiltered truth: an s01 top hit whose label
    // is allowed must appear in s21 at an equal-or-better rank
    val s01 = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .select("query_id", "cand_id", "rank")
      .as[(Long, Long, Long)].collect()
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val filteredRanks = rows.map(r => (r._1, r._2) -> r._4).toMap
    s01.filter { case (_, c, _) => allowed(labels(c).toLong) }
      .foreach { case (q, c, rk) =>
        val frk = filteredRanks.get((q, c))
        assert(frk.exists(_ <= rk),
          s"allowed s01 hit ($q,$c) rank $rk missing/demoted in s21: $frk")
      }
  }

  test("lloydChain lineage truncation keeps the s16 plan flat in rounds") {
    // the final plan must not nest one crossJoin per Lloyd round: the
    // centroid side is a truncated leaf, so exactly ONE join with the
    // corpus scan survives in the last assignment round
    val plan = SparkEntry.queries("s16_kmeans_iterations")(spark, sf)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // final rollup join + final round's assign crossJoin — NOT 3 chained
    // assign joins (the untruncated shape)
    assert(joins.size <= 2,
      s"expected <=2 joins in the truncated s16 plan, got ${joins.size}")
  }
}
