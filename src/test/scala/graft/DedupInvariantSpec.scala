package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.helium.SparkSuite

/** Dedup invariants on a *generated* corpus with planted near-duplicates —
  * complements the real-data subset test in QuerySurfaceSpec. */
class DedupInvariantSpec extends SparkSuite {
  import spark.implicits._

  /** 60 base docs + 15 planted near-dups (1-2 token edits) + 5 exact dups,
    * written as a documents-shaped parquet dir so the production queries
    * run unchanged. */
  private lazy val corpusDir: String = {
    val rnd = new scala.util.Random(123)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    def randDoc(): String =
      Seq.fill(40 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val bases = Seq.fill(60)(randDoc())
    val nearDups = (0 until 15).map { i =>
      val toks = bases(i).split(" ")
      toks.updated(rnd.nextInt(toks.length), "EDITED").mkString(" ")
    }
    val exactDups = bases.take(5)
    val all = bases ++ nearDups ++ exactDups
    val dir = Files.createTempDirectory("corpus").toString
    all.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup finds exactly the planted exact duplicates") {
    val groups = SparkEntry.queries("d01_exact_dup_groups")(spark, corpusDir)
    assert(groups.count() == 5)
  }

  test("LSH near-dup pairs are a subset of exact Jaccard pairs and find planted dups") {
    val lsh = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = SparkEntry.queries("d05_ngram_jaccard_exact")(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    // planted near-dups (base i, 60+i) have jaccard far above threshold;
    // the exact pass must find every one of them
    val planted = (0 until 15).map(i => (i.toLong, 60L + i)).toSet
    assert(planted.subsetOf(exact), s"missed exact: ${planted -- exact}")
    // and LSH recall on planted pairs is high (banding catches jacc>=~0.63)
    val recall = (planted & lsh).size.toDouble / planted.size
    assert(recall >= 0.8, s"LSH recall $recall")
  }

  test("d08 survivor accounting: dropped docs are exactly non-minimal component members") {
    val byColumns = SparkEntry.queries("d08_dedup_survivors")(spark, corpusDir)
      .select("source", "n_before", "n_after")
      .as[(String, Long, Long)].collect()
    val totalBefore = byColumns.map(_._2).sum
    val totalAfter = byColumns.map(_._3).sum
    assert(totalBefore == 80) // 60 bases + 15 near + 5 exact
    // every doc the pipeline dropped must be a non-minimal member of some
    // near-dup component built from the LSH pairs
    val pairs = SparkEntry.queries("d03_minhash_lsh_pairs")(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val comp = graft.operators.ConnectedComponents
      .run(pairs.toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val expectedDropped = comp.count { case (node, label) => node != label }
    assert(totalBefore - totalAfter == expectedDropped,
      s"dropped ${totalBefore - totalAfter}, components imply $expectedDropped")
    assert(totalAfter < totalBefore) // the planted dups force real drops
  }

  test("d05/t06 100TB path: the df>1 prefilter flag preserves the exact pair sets") {
    // the scale switch (spark.graft.dedup.dfPrefilter) semi-filters
    // inverted-index keys to df>1 before the self-join — singletons
    // cannot pair, so the rewrite must be result-identical. Exercise the
    // PRODUCTION flag on both queries that honor it.
    def run(q: String) = SparkEntry.queries(q)(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    val plainD05 = run("d05_ngram_jaccard_exact")
    val plainT06 = run("t06_winnowing_overlap")
    spark.conf.set("spark.graft.dedup.dfPrefilter", "true")
    try {
      assert(run("d05_ngram_jaccard_exact") == plainD05,
        "prefilter changed d05's exact pair set")
      assert(run("t06_winnowing_overlap") == plainT06,
        "prefilter changed t06's containment pair set")
    } finally spark.conf.unset("spark.graft.dedup.dfPrefilter")
    assert(plainD05.nonEmpty && plainT06.nonEmpty,
      "equality vacuous: planted corpus produced no pairs")
  }

  test("d16 exact-pairs mode bounds the LSH audit cell-wise from above") {
    // the leakage audit over d05's exact pairs must see at least as many
    // pairs in EVERY (split_lo, split_hi) cell as the LSH default — LSH
    // only loses pairs, and a lost cross-split pair is understated
    // contamination. Exercise the production flag end-to-end.
    def cells() = SparkEntry.queries("d16_split_leakage")(spark, corpusDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val lsh = cells()
    spark.conf.set("spark.graft.dedup.leakage.exactPairs", "true")
    val exact = try cells()
      finally spark.conf.unset("spark.graft.dedup.leakage.exactPairs")
    assert(lsh.nonEmpty, "audit vacuous: planted corpus produced no cells")
    lsh.foreach { case (cell, n) =>
      assert(exact.getOrElse(cell, 0L) >= n,
        s"exact audit lost pairs at $cell: exact=${exact.get(cell)} lsh=$n")
    }
    assert(exact.values.sum >= lsh.values.sum)
  }

  test("d19 exact-pairs mode bounds the LSH provenance matrix cell-wise " +
    "from above") {
    // same contract as the d16 audit: the cross-source duplication matrix
    // over exact pairs must see >= the LSH default in EVERY source-pair
    // cell (LSH only loses pairs — understated cross-source duplication)
    def cells() = SparkEntry.queries("d19_cross_source_dups")(spark, corpusDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val lsh = cells()
    spark.conf.set("spark.graft.dedup.leakage.exactPairs", "true")
    val exact = try cells()
      finally spark.conf.unset("spark.graft.dedup.leakage.exactPairs")
    assert(lsh.nonEmpty, "matrix vacuous: planted corpus produced no cells")
    lsh.foreach { case (cell, n) =>
      assert(exact.getOrElse(cell, 0L) >= n,
        s"exact matrix lost pairs at $cell: exact=${exact.get(cell)} lsh=$n")
    }
  }

  test("winnowing containment also surfaces the planted near-dups") {
    val winnow = SparkEntry.queries("t06_winnowing_overlap")(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = (0 until 15).map(i => (i.toLong, 60L + i)).toSet
    assert((planted & winnow).size >= 12, s"winnowing found ${(planted & winnow).size}/15")
  }
}
