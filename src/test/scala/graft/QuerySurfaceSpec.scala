package graft

import org.apache.spark.sql.functions._

import graft.helium.SparkSuite

/** Spot checks on query-surface pieces the DuckDB oracle can't cover. */
class QuerySurfaceSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("entry flagship returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q22 bound certificate: every group's HLL estimate within 5% of exact") {
    // the within_5pct flag IS the accuracy assertion, computed in-query
    // from the live sketch; the DuckDB oracle hash-gates it as TRUE
    val rows = SparkEntry.queries("q22_approx_distinct")(spark, sf)
      .select(col("l_returnflag"), col("within_5pct")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(1),
      s"HLL estimate out of bound for ${r.getString(0)}"))
  }

  test("q39 bound certificate: every sketch quartile within one unit, and " +
    "the exact quartiles agree with q47's discrete quantiles") {
    val rows = SparkEntry.queries("q39_approx_quartiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_unit"),
      s"sketch quartile out of bound for ${r.getAs[String]("l_linestatus")}"))
    // cross-check: q39's embedded exact quartiles = q47's (same CDF rule)
    val q47 = SparkEntry.queries("q47_disc_quantiles")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("l_linestatus") ->
        (r.getAs[Double]("disc_q25"), r.getAs[Double]("disc_q50"),
          r.getAs[Double]("disc_q75"))).toMap
    rows.foreach { r =>
      val e = q47(r.getAs[String]("l_linestatus"))
      assert((r.getAs[Double]("exact_q25"), r.getAs[Double]("exact_q50"),
        r.getAs[Double]("exact_q75")) == e)
    }
  }

  test("every declared query returns rows at sf0.01 — the dup-hunters " +
    "included, via their planted probe copies") {
    // d01/t05/m11 hunt exact copies, which the clean testdata corpus
    // has none of — they run over Tables.documentsWithProbe (three
    // planted copies) precisely so their oracle comparison, and this
    // check, exercise the dup-POSITIVE path
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys with matching columns impossible to typo") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle-only keys: ${ok -- qk}")
  }

  test("short bench ids (prefix before first '_') stay unique across the surface") {
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"Bench JSON would drop timings for: ${dups.mkString(", ")}")
  }

  test("LSH near-dup pairs (d03) are a subset of exact Jaccard pairs (d05)") {
    val lsh = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("d05_ngram_jaccard_exact")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH found pairs exact Jaccard rejects: ${lsh -- exact}")
    // and LSH recall on this data is high (banding catches jacc >= ~0.63;
    // every observed near-dup pair here is far above that)
    assert(lsh.nonEmpty && exact.nonEmpty)
  }

  test("banded embedding pairs (s11) are a subset of the exact audit (s04) with real recall") {
    val exact = SparkEntry.queries("s04_embedding_neardup")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SparkEntry.queries("s11_embedding_lsh_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every banded pair passed the same exact cosine test -> subset
    assert(banded.subsetOf(exact),
      s"banded pairs outside the exact audit: ${banded -- exact}")
    // 8 tables x 4 planes at cos 0.45 (p ~ 0.65): expect recall ~ 0.8;
    // bound loosely at 0.5 against hash luck on the small sample
    assert(exact.nonEmpty && banded.size.toDouble / exact.size >= 0.5,
      s"recall ${banded.size}/${exact.size}")
    // and the gated recall report agrees with the sets we just computed
    val rep = SparkEntry.queries("s12_banded_recall_report")(spark, sf).collect()(0)
    assert(rep.getAs[Long]("n_truth") == exact.size.toLong)
    assert(rep.getAs[Long]("n_got") == banded.size.toLong)
    assert(rep.getAs[Long]("n_tp") == (banded & exact).size.toLong)
  }

  test("s15 sampled recall estimates s12's full recall from sample-restricted exact truth") {
    // recompute sample membership independently (JVM MD5 of "444_<id>",
    // first 15 hex digits mod 1000 < 500 — Portable.hash60's definition)
    def sampled(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"444_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16) % 1000 < 500
    }
    val exact = SparkEntry.queries("s04_embedding_neardup")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rep = SparkEntry.queries("s15_sampled_recall")(spark, sf).collect()(0)
    // the sampled truth is EXACTLY the s04 pairs touching the sample —
    // restriction loses pairs, never invents or mis-scores them
    val expectTruth = exact.filter(p => sampled(p._1) || sampled(p._2))
    assert(rep.getAs[Long]("n_truth") == expectTruth.size.toLong,
      s"sampled truth diverged from restricted exact audit: $rep")
    // precision is 1.0 by construction (s11 exact-verifies candidates)
    assert(rep.getAs[Long]("n_tp") == rep.getAs[Long]("n_got"), rep.toString)
    // identity-hash sample sits near its 500 per-mille target
    val nVecs = Tables.embeddings(spark, sf).count()
    val pm = 1000.0 * rep.getAs[Long]("n_sample") / nVecs
    assert(pm > 400 && pm < 600, s"sample rate $pm per-mille off target")
    // and the estimate agrees with the full-cartesian report within
    // binomial error of the small truth set (~10 pairs at sf0.01:
    // one missed pair moves recall 100 per-mille)
    val full = SparkEntry.queries("s12_banded_recall_report")(spark, sf)
      .collect()(0).getAs[Long]("recall_pm")
    val est = rep.getAs[Long]("recall_pm")
    assert(math.abs(est - full) <= 250,
      s"sampled recall $est vs full $full diverged beyond sampling error")
  }

  test("s16 iterated k-means assigns every vector each round and refines s13's seed step") {
    val rows = SparkEntry.queries("s16_kmeans_iterations")(spark, sf).collect()
    // the final assignment partitions the corpus exactly — nothing
    // dropped, nothing double-assigned
    assert(rows.map(_.getAs[Long]("n_members")).sum
      == Tables.embeddings(spark, sf).count())
    // sum-centroids of real members are nonzero on this data
    rows.foreach(r => assert(r.getAs[Long]("centroid_norm2") > 0L, r.toString))
    // the seed round (s13) and round-3 memberships genuinely differ —
    // iterating moved at least one vector, so s16 isn't s13 re-labeled
    val seed = SparkEntry.queries("s13_kmeans_step")(spark, sf).collect()
      .map(r => r.getAs[Long]("c_id") -> r.getAs[Long]("n_members")).toMap
    val fin = rows.map(r => r.getAs[Long]("c_id") -> r.getAs[Long]("n_members")).toMap
    assert(seed != fin, "3 Lloyd rounds changed no assignment — vacuous iteration")
  }

  test("d18 scrub removes exactly the train docs near-dup to eval docs — no more, no less") {
    // independent split recomputation (JVM MD5 of "777_<id>", the
    // splitCol definition) so the test cannot inherit a split bug
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"777_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val b = BigInt(hex, 16) % 1000
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val pairs = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectedDrop = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (x, y) if split(x) == "train" && split(y) != "train" => x }
      .toSet
    val rows = SparkEntry.queries("d18_train_decontaminated")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_dropped")).sum == expectedDrop.size.toLong,
      s"scrub dropped a different doc set than the cross-split pairs imply")
    // accounting consistency and the decontamination invariant: no
    // surviving train doc still pairs with an eval doc
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train_after")
        == r.getAs[Long]("n_train_before") - r.getAs[Long]("n_dropped"))
    }
    val surviving = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
      .filter(id => split(id) == "train" && !expectedDrop.contains(id)).toSet
    pairs.foreach { case (a, b) =>
      val leak = (surviving.contains(a) && split(b) != "train") ||
        (surviving.contains(b) && split(a) != "train")
      assert(!leak, s"pair ($a,$b) still leaks after the scrub")
    }
  }

  test("d15 splits partition the corpus ~800/100/100 per-mille with no overlap") {
    val rows = SparkEntry.queries("d15_train_split")(spark, sf)
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf).count()
    assert(rows.values.sum == total, "splits must partition the corpus exactly")
    // hash uniformity: each split within ±15% of its target share
    val share = Map("train" -> 800L, "val" -> 100L, "test" -> 100L)
    share.foreach { case (s, pm) =>
      val got = rows.getOrElse(s, 0L) * 1000L / total
      assert(math.abs(got - pm) <= 150, s"$s split at $got‰, wanted ~$pm‰")
    }
  }

  test("d16 leakage cells partition the d03 pair set exactly") {
    val cells = SparkEntry.queries("d16_split_leakage")(spark, sf).collect()
    val totalPairs = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "every near-dup pair must land in exactly one split-pair cell")
    assert(totalPairs > 0, "audit vacuous: no near-dup pairs at this sf")
  }

  test("d19 cross-source matrix partitions the d03 pair set into ordered cells") {
    val cells = SparkEntry.queries("d19_cross_source_dups")(spark, sf).collect()
    val totalPairs = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "every near-dup pair must land in exactly one source-pair cell")
    assert(totalPairs > 0, "matrix vacuous: no near-dup pairs at this sf")
    // cells are canonically ordered and jaccard sums respect the d03 floor
    cells.foreach { r =>
      assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b"), r.toString)
      assert(r.getAs[Long]("sum_jacc") >= 500L * r.getAs[Long]("n_pairs"),
        s"mean jaccard below the d03 admission floor: $r")
    }
  }

  test("d20 quality selection keeps one winner per cluster, same totals as d08") {
    val d08 = SparkEntry.queries("d08_dedup_survivors")(spark, sf).collect()
    val d20 = SparkEntry.queries("d20_quality_survivors")(spark, sf).collect()
    // identical corpus, identical clusters => identical GLOBAL survivor
    // counts (exactly one canonical per cluster under either rule); only
    // the per-source attribution may shift, and only for switched winners
    assert(d08.map(_.getAs[Long]("n_before")).sum ==
      d20.map(_.getAs[Long]("n_before")).sum)
    assert(d08.map(_.getAs[Long]("n_after")).sum ==
      d20.map(_.getAs[Long]("n_after")).sum,
      "quality-aware selection must not change how many docs survive")
    val switched = d20.map(_.getAs[Long]("n_switched")).sum
    assert(switched >= 0 && switched <= d20.map(_.getAs[Long]("n_before")).sum)
  }

  test("t17 spectrum buckets bound tf by powers of two and conserve token mass") {
    val rows = SparkEntry.queries("t17_freq_spectrum")(spark, sf).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_tf") >= (1L << b) &&
        r.getAs[Long]("max_tf") < (1L << (b + 1)),
        s"bucket $b must hold tf in [2^$b, 2^${b + 1}): $r")
    }
    // same tokenizer as t01 => the spectrum conserves total token mass
    val total = SparkEntry.queries("t01_text_stats")(spark, sf).collect()
      .map(_.getAs[Long]("sum_words")).sum
    assert(rows.map(_.getAs[Long]("sum_tf")).sum == total,
      "spectrum must conserve the corpus token count")
  }

  test("t20 richness conserves token mass against t01/t17 and bounds " +
    "hapaxes by types") {
    val rows = SparkEntry.queries("t20_vocab_richness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"), r.toString)
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"), r.toString)
      val ttr = r.getAs[Long]("ttr_pm")
      assert(ttr >= 0 && ttr <= 1000, r.toString)
    }
    // same tokenizer as t01 => per-source token masses sum to the corpus
    val total = SparkEntry.queries("t01_text_stats")(spark, sf).collect()
      .map(_.getAs[Long]("sum_words")).sum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total,
      "per-source token masses must conserve the corpus token count")
  }

  test("t18 novelty rates are valid per-mille shares of each source's bigrams") {
    val rows = SparkEntry.queries("t18_novel_bigrams")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pm = r.getAs[Long]("novelty_pm")
      assert(pm >= 0 && pm <= 1000, r.toString)
      assert(r.getAs[Long]("sum_novel") <= r.getAs[Long]("sum_bigrams"), r.toString)
    }
  }

  test("s13 Lloyd step assigns every vector exactly once") {
    val rep = SparkEntry.queries("s13_kmeans_step")(spark, sf).collect()
    val assigned = rep.map(_.getAs[Long]("n_members")).sum
    val total = Tables.embeddings(spark, sf).count()
    assert(assigned == total,
      s"assigned $assigned of $total vectors — argmax must be total")
    assert(rep.length <= 16, "more clusters than seeds")
  }

  test("ANN recall: LSH (s02) and IVF (s05) top-3 hit the brute-force top-3") {
    // ground truth: exact top-3 per query from the brute-force scan
    val exact = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .filter(col("rank") <= 3).select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, sf)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val lsh = recallOf("s02_ann_lsh")
    val ivf = recallOf("s05_ann_ivf")
    // single-table LSH probes one bucket; IVF probes 2/16 lists — both
    // must find a meaningful share of the true neighbours on this data
    assert(lsh >= 0.3, s"LSH recall $lsh")
    assert(ivf >= 0.5, s"IVF recall $ivf")
    // the two-stage serving path (IVF probe -> PQ shortlist -> exact
    // re-rank) reads full vectors only for the shortlist. Its ceiling
    // is s05's own recall (PQ can only drop what the probe found —
    // 0.5 on this data); depth-32 ADC keeps >= 80% of that ceiling
    val served = recallOf("s17_ivf_pq_rerank")
    assert(served >= 0.8 * ivf, s"IVF+PQ+re-rank recall $served vs ceiling $ivf")
  }

  test("s17 candidates are a subset of s05's probed lists with exact final scores") {
    val served = SparkEntry.queries("s17_ivf_pq_rerank")(spark, sf).collect()
    // re-ranked cosines are EXACT: each must equal the brute-force cosine
    // for that (query, cand) pair bit-for-bit (same expression tree)
    val brute = SparkEntry.queries("s01_knn_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    served.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
      brute.get(k).foreach(exact =>
        assert(r.getAs[Double]("cos") == exact,
          s"ADC shortlist re-rank produced a non-exact score at $k"))
    }
    assert(served.nonEmpty && served.length <= 8 * 3, "per-query top-3 shape")
  }

  test("SQL surface: registered views answer the same query as the DataFrame plan") {
    Catalog.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)
      .orderBy("r_name", "n_name").collect().toSeq
    val df = SparkEntry.queries("q04_star_join_revenue")(spark, sf)
      .orderBy("r_name", "n_name").collect().toSeq
    assert(sql == df)
  }

  test("jsonb typed view via Spark 4 Variant (txn fields path)") {
    import spark.implicits._
    val env = Seq(
      (100L, "h1", "payment_v1", """{"payer":"acctA","amount":10}"""),
      (101L, "h2", "payment_v1", """{"payer":"acctB","amount":20}"""))
      .toDF("block", "hash", "type", "fields")
    val v = env.withColumn("vf", parse_json(col("fields")))
      .select(col("block"),
        variant_get(col("vf"), "$.payer", "string").as("payer"),
        variant_get(col("vf"), "$.amount", "long").as("amount"))
    assert(v.as[(Long, String, Long)].collect().toSet
      == Set((100L, "acctA", 10L), (101L, "acctB", 20L)))
  }
}
