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

  test("d12 100TB path: the bloom contamination prefilter preserves the " +
    "exact result and actually routes through the bloom") {
    // the scale switch (spark.graft.dedup.contamPrefilter) bloom-filters
    // corpus shingles against the tiny probe side BEFORE the distinct —
    // no false negatives, and the exact semi-join still decides
    // membership, so the rewrite must be result-identical
    def run() = SparkEntry.queries("d12_contamination")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    val plain = run()
    assert(plain.nonEmpty)
    spark.conf.set("spark.graft.dedup.contamPrefilter", "true")
    try {
      assert(run() == plain, "bloom prefilter changed d12's result")
      val p = SparkEntry.queries("d12_contamination")(spark, corpusDir)
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), s"flag ignored:\n$p")
    } finally spark.conf.unset("spark.graft.dedup.contamPrefilter")
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

  /** Tiny handcrafted corpus for the span-dedup / LM-score clean-room
    * checks — every expected value below is computable by hand. */
  private lazy val handDir: String = {
    val c = (n: Int) => (0 until 8).map(i => s"w${n}_$i").mkString(" ")
    val docs = Seq(
      c(0) + " " + c(1),  // doc 0: two fresh chunks
      c(0) + " " + c(2),  // doc 1: chunk c0 already seen in doc 0
      c(3) + " " + c(3),  // doc 2: repeats its OWN first chunk
      "a b a b",          // doc 3 (short: one partial chunk)
      "a b c",            // doc 4
      "c c")              // doc 5
    val dir = Files.createTempDirectory("hand").toString
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d21 span dedup: first occurrence survives, later aligned chunks " +
    "(cross-doc AND within-doc) are cut, reassembly digest matches") {
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val c = (n: Int) => (0 until 8).map(i => s"w${n}_$i").mkString(" ")
    val rows = SparkEntry.queries("d21_span_dedup")(spark, handDir)
      .select("doc_id", "n_chunks", "n_kept", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(0L) == ((2L, 2L, md5(c(0) + " " + c(1)))))
    // doc 1's first chunk is doc 0's first chunk — cut, c2 survives
    assert(rows(1L) == ((2L, 1L, md5(c(2)))))
    // doc 2 repeats its own chunk: within-doc cut, one survivor
    assert(rows(2L) == ((2L, 1L, md5(c(3)))))
    // short docs: one partial chunk each, all distinct, all kept
    assert(rows(3L) == ((1L, 1L, md5("a b a b"))))
    assert(rows(5L) == ((1L, 1L, md5("c c"))))
  }

  test("d21 on the planted corpus: exact-duplicate docs lose every chunk") {
    val rows = SparkEntry.queries("d21_span_dedup")(spark, corpusDir)
      .select("doc_id", "n_chunks", "n_kept", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e" // md5("")
    // docs 75..79 are byte-exact copies of docs 0..4: every aligned
    // chunk was already seen at the smaller doc_id
    rows.filter(r => r._1 >= 75L).foreach { case (id, n, kept, m) =>
      assert(n > 0 && kept == 0L && m == emptyMd5,
        s"exact-dup doc $id kept $kept of $n chunks")
    }
    // base docs (0..59) precede their copies, and a FULL 8-token chunk
    // from a 20-word vocabulary collides with ~0 probability — but the
    // trailing PARTIAL chunk can be as short as one token and those DO
    // collide across bases (legitimately: short trailing spans dedup
    // like any other). So bases keep every full chunk.
    rows.filter(r => r._1 < 60L).foreach { case (id, n, kept, _) =>
      assert(kept >= n - 1, s"base doc $id lost a full chunk ($kept/$n)")
    }
  }

  test("t19 bigram LM score: hand-computed MLE inverse-probability values") {
    val rows = SparkEntry.queries("t19_bigram_lm_score")(spark, handDir)
      .select("doc_id", "n_trans", "sum_inv_pm", "score_pm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 3/4/5 share the a/b/c vocabulary: bgc = {(a,b)->3, (b,a)->1,
    // (b,c)->1, (c,c)->1}, prefixes c(a·)=3, c(b·)=2, c(c·)=1, so
    // inv_pm(a,b)=1000, (b,a)=2000, (b,c)=2000, (c,c)=1000
    assert(rows(3L) == ((3L, 4000L, 1333L))) // a b a b
    assert(rows(4L) == ((2L, 3000L, 1500L))) // a b c
    assert(rows(5L) == ((1L, 1000L, 1000L))) // c c
  }

  test("t19 on the planted corpus: exact duplicates score identically, " +
    "and every score is a valid inverse probability (>= 1000)") {
    val rows = SparkEntry.queries("t19_bigram_lm_score")(spark, corpusDir)
      .select("doc_id", "n_trans", "sum_inv_pm", "score_pm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (0 until 5).foreach { i =>
      assert(rows(i.toLong) == rows(75L + i),
        s"exact dup ${75 + i} scores differently from base $i")
    }
    rows.values.foreach { case (_, _, score) => assert(score >= 1000L) }
  }

  test("winnowing containment also surfaces the planted near-dups") {
    val winnow = SparkEntry.queries("t06_winnowing_overlap")(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = (0 until 15).map(i => (i.toLong, 60L + i)).toSet
    assert((planted & winnow).size >= 12, s"winnowing found ${(planted & winnow).size}/15")
  }

  /** d23/t21 fixture: token runs shared at ARBITRARY (non-chunk-aligned)
    * offsets, so the expected anchors/intervals are computable by hand.
    * Symbols are all distinct across families (a/u/p/v/b) — the only
    * 8-gram matches are the planted ones. */
  private lazy val substrDir: String = {
    def run(p: String, n: Int, from: Int = 0) =
      (from until from + n).map(i => s"$p$i")
    val a = run("a", 20)
    val docs = Seq(
      a,                                                     // 0: fresh
      a.take(10) ++ run("u", 10),                            // 1: head copy
      run("p", 10) ++ a.take(8) ++ run("v", 5) ++
        a.slice(10, 18),                                     // 2: two islands
      run("b", 8) ++ run("b", 8),                            // 3: self-repeat
      Seq("x", "y", "z"),                                    // 4: < k tokens
      a)                                                     // 5: exact copy
    val dir = Files.createTempDirectory("substr").toString
    docs.map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val md5Of = (s: String) => java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  test("d23 substring dedup: hand-computed anchors, merged intervals, " +
    "and removal mass at unaligned offsets") {
    val rows = SparkEntry.queries("d23_substring_dedup")(spark, substrDir)
      .select("doc_id", "n_toks", "n_anchors", "n_intervals", "n_removed",
        "iv_md5")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val none = md5Of("")
    // doc 0 is globally first: nothing to remove
    assert(rows(0L) == ((20L, 0L, 0L, 0L, none)))
    // doc 1 copies a0..a9: grams at 0,1,2 are dups -> one interval [0,9]
    assert(rows(1L) == ((20L, 3L, 1L, 10L, md5Of("0:9"))))
    // doc 2 embeds a0..a7 at offset 10 and a10..a17 at offset 23 — two
    // single-anchor islands, NOT mergeable (gap 13 > k)
    assert(rows(2L) == ((31L, 2L, 2L, 16L, md5Of("10:17,23:30"))))
    // doc 3 repeats its OWN first 8 tokens: within-doc anchor at 8
    assert(rows(3L) == ((16L, 1L, 1L, 8L, md5Of("8:15"))))
    // doc 4 is shorter than k: no grams, clean report
    assert(rows(4L) == ((3L, 0L, 0L, 0L, none)))
    // doc 5 is an exact copy: every position 0..12 anchors, one interval
    assert(rows(5L) == ((20L, 13L, 1L, 20L, md5Of("0:19"))))
  }

  test("d23 on the planted corpus: exact copies fully removed, bases " +
    "untouched, one-token-edit near-dups lose all but the edit window") {
    val rows = SparkEntry.queries("d23_substring_dedup")(spark, corpusDir)
      .select("doc_id", "n_toks", "n_intervals", "n_removed")
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (id, n, niv, rem) =>
      if (id < 60L)       // bases precede all planted copies; a random
        assert(rem == 0L, // 8-gram collision from a 20-word vocab is ~0
          s"base doc $id lost $rem tokens")
      else if (id >= 75L) // exact copies: one interval covering the doc
        assert(niv == 1L && rem == n, s"copy doc $id kept ${n - rem}")
      else                // 1-token edit: only the edit's k-window survives
        assert(rem >= n - 8L && rem < n,
          s"near-dup doc $id removed $rem of $n")
    }
  }

  test("d23 hot-gram isolation: a gram at ~17% of all gram rows routes " +
    "through the broadcast arm, result identical to the shuffle-only plan") {
    // every doc opens with the SAME 8-gram (a license-header stand-in),
    // then a per-doc unique tail: 13 tokens -> 6 grams/doc, exactly one
    // of which (position 0) is the shared hot gram
    val hot = (0 until 8).map(i => s"h$i").mkString(" ")
    val docs = (0 until 200).map { i =>
      val tail = (0 until 5).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$hot $tail", "en", s"src${i % 2}", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val cold = graft.queries.TextDedupOps.d23Report(spark, docs)
      .orderBy("doc_id").collect().toSeq
    // hotCount=0 must behave exactly like unset (the explicit opt-out)
    spark.conf.set("spark.graft.d23.hotCount", "0")
    try assert(graft.queries.TextDedupOps.d23Report(spark, docs)
      .orderBy("doc_id").collect().toSeq == cold)
    finally spark.conf.unset("spark.graft.d23.hotCount")
    spark.conf.set("spark.graft.d23.hotCount", "100")
    try {
      val run = graft.queries.TextDedupOps.d23Report(spark, docs)
      val p = run.queryExecution.executedPlan.toString
      assert(p.contains("Union"),
        s"hot-gram isolation lost its two-arm union:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"hot arm should broadcast the winners, not shuffle the grams:\n$p")
      assert(run.orderBy("doc_id").collect().toSeq == cold,
        "hot-gram isolation changed the verdicts")
    } finally spark.conf.unset("spark.graft.d23.hotCount")
  }

  test("d23 default path vs AQE skew-join: the agg-fed winners join " +
    "CANNOT be runtime-split (measured), so the explicit hotCount " +
    "threshold — not AQE — is the stop-gram skew cover") {
    // Hypothesis tested and falsified this round: "AQE's skew-join
    // split covers the default path's hot keys". It does not, for a
    // structural reason this test pins: OptimizeSkewedJoin only matches
    // joins whose children are bare sort-over-shuffle stages, and the
    // winners side of d23's join is Sort <- HashAggregate <- shuffle —
    // the aggregate rides the same gram partitioning the join uses, so
    // there is no splittable shuffle boundary on that side. The CONTROL
    // below proves the thresholds used here DO fire on the same data
    // when both sides are bare shuffles — the blocker is the plan
    // shape, not the sizing.
    val hot = (0 until 8).map(i => s"k$i").mkString(" ")
    val docs = (0 until 800).map { i =>
      (i.toLong, s"$hot w${i}y0 w${i}y1", "en", s"src${i % 2}", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val baseline = graft.queries.TextDedupOps.d23Report(spark, docs)
      .orderBy("doc_id").collect().toSeq
    val confs = Seq(
      // force the production join shape: a vocab-sized winners table
      // is not broadcastable at 100 TB
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // thresholds far below the fixture's partition sizes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128b",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // CONTROL: the same skewed key over two BARE shuffle sides —
      // the skew rule fires under these thresholds
      val left = (0 until 2400).map(i =>
        (if (i % 3 == 0) "hotkey" else s"cold$i", i.toLong))
        .toDF("k", "v")
      val right = ("hotkey" +: (0 until 2400 by 3).map(i => s"cold$i"))
        .map((_, 1L)).toDF("k", "w")
      val ctl = left.join(right, Seq("k")).orderBy("v")
      ctl.collect()
      val ctlPlan = ctl.queryExecution.executedPlan.toString
      assert(ctlPlan.contains("skew=true"),
        s"control join not skew-split — thresholds insufficient:\n$ctlPlan")
      // SUBJECT: d23's winners join under identical thresholds — the
      // aggregate-fed side blocks the split. If a Spark upgrade makes
      // this assertion fail, AQE learned to split agg-fed joins:
      // revisit the hotCount default (the 9.4x detection cost argument
      // still stands, but the skew story would gain a free cover).
      val run = graft.queries.TextDedupOps.d23Report(spark, docs)
        .orderBy("doc_id")
      val got = run.collect().toSeq
      val p = run.queryExecution.executedPlan.toString
      assert(!p.contains("skew=true"),
        s"AQE now splits the agg-fed winners join — revisit d23 docs:\n$p")
      assert(got == baseline, "conf changes altered the verdicts")
      // and the REAL cover: the explicit threshold reroutes the hot key
      // through the broadcast arm under the same session confs
      spark.conf.set("spark.graft.d23.hotCount", "100")
      val iso = try graft.queries.TextDedupOps.d23Report(spark, docs)
        .orderBy("doc_id").collect().toSeq
      finally spark.conf.unset("spark.graft.d23.hotCount")
      assert(iso == baseline, "hot-gram isolation changed the verdicts")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
  test("t21 overlap chunks: ceil(n/S) windows per doc, hand-checked " +
    "offsets, short tails, and digests") {
    val rows = SparkEntry.queries("t21_overlap_chunks")(spark, substrDir)
      .select("doc_id", "idx", "t_start", "n_chunk_toks", "chunk_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    // ceil(n/16) per doc: 20->2, 20->2, 31->2, 16->1, 3->1, 20->2
    assert(rows.length == 10)
    val doc0 = rows.filter(_._1 == 0L).sortBy(_._2)
    val a = (0 until 20).map(i => s"a$i")
    // window 32 > doc length: first chunk is the whole doc
    assert(doc0(0) == ((0L, 0L, 0L, 20L, md5Of(a.mkString(" ")))))
    // second window starts at stride 16, runs 4 short-tail tokens
    assert(doc0(1) == ((0L, 1L, 16L, 4L, md5Of(a.drop(16).mkString(" ")))))
    val doc4 = rows.filter(_._1 == 4L)
    assert(doc4.toSeq == Seq((4L, 0L, 0L, 3L, md5Of("x y z"))))
    // overlap invariant: consecutive windows of a 31-token doc share
    // 32 - 16 = 16 tokens of coverage (starts differ by exactly S)
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(doc2.toSeq == Seq(0L, 16L))
  }

  test("d24 delta dedup: exact copy, near edit, and novel delta docs " +
    "verdict correctly against the persisted base index") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // the base/delta split is a doc_id hash — discover membership first,
    // then PLACE each planted document on the side its role needs
    val probe = (0L until 200L).toDF("doc_id")
      .withColumn("is_delta",
        pmod(graft.functions.Portable.hash60(col("doc_id").cast("string"),
          424), lit(5L)) === 0L)
      .as[(Long, Boolean)].collect().toMap
    val baseIds = (0L until 200L).filter(id => !probe(id)).take(2)
    val deltaIds = (0L until 200L).filter(probe).take(3)
    val baseText = (0 until 40).map(i => s"w$i").mkString(" ")
    val otherBase = (0 until 40).map(i => s"q$i").mkString(" ")
    val nearText = baseText.split(" ").updated(7, "EDITED").mkString(" ")
    val novel = (0 until 40).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (baseIds(0), baseText), (baseIds(1), otherBase),
      (deltaIds(0), baseText),   // exact copy of a base doc
      (deltaIds(1), nearText),   // one-token edit of a base doc
      (deltaIds(2), novel))      // nothing like it in the index
    val dir = Files.createTempDirectory("delta").toString
    docs.map { case (i, t) => (i, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.d24.indexDir",
      Files.createTempDirectory("deltaidx").toString)
    try {
      val rows = SparkEntry.queries("d24_delta_dedup")(spark, dir)
        .select("doc_id", "verdict", "winner", "est_pm")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // only delta docs report
      assert(rows.keySet == deltaIds.toSet)
      assert(rows(deltaIds(0)) == (("exact", baseIds(0), 1000L)))
      val (v1, w1, e1) = rows(deltaIds(1))
      assert(v1 == "near" && w1 == baseIds(0),
        s"near edit got $v1/$w1")
      // 1-token edit of 40 tokens: shingle jaccard ~0.85, so the
      // 12-component estimate sits well above the 500pm floor and
      // below exact's 1000
      assert(e1 >= 500L && e1 < 1000L, s"est $e1")
      assert(rows(deltaIds(2)) == (("unique", -1L, 0L)))
    } finally spark.conf.unset("spark.graft.d24.indexDir")
  }

  test("d23 at scale: 100k docs / ~5M gram rows, planted cross-doc runs " +
    "at a fixed offset — linear anchor plan, exact interval algebra " +
    "(gated: set GRAFT_SLOW_SPECS=1)") {
    assume(sys.env.get("GRAFT_SLOW_SPECS").contains("1"),
      "slow spec — enable with GRAFT_SLOW_SPECS=1")
    import org.apache.spark.sql.functions.{col, concat, expr, lit, pmod}
    // 100k docs x 60 tokens from a 5k vocabulary (random 8-gram
    // collisions ~ 5000^-8 x pairs = none); every 10th doc embeds the
    // SAME 16-token run at offset 20 — anchors 20..28, one interval
    // [20, 35] in every planted doc except the global first
    val n = 100000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 59), j ->
        CASE WHEN id % 10 = 0 AND j BETWEEN 20 AND 35
             THEN concat('s', j - 20)
             ELSE concat('w', pmod(xxhash64(id * 60 + j), 5000)) END))""")
        .as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(4))).as("source"),
      lit(60L).as("n_chars"))
    val dir = Files.createTempDirectory("substrscale").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val agg = SparkEntry.queries("d23_substring_dedup")(spark, dir)
      .groupBy(col("n_intervals"), col("n_removed"))
      .count()
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"d23 over ${n}%d docs (~${n * 53}%d grams): $secs%.1f s")
    // every planted doc except the global first carries ONE interval
    // covering the 16-token run — possibly extended by a few tokens,
    // because the 10k planted docs birthday-collide on the single
    // random tokens flanking the shared run (10k draws over a 5k
    // vocabulary), which legitimately chains boundary anchors. The
    // extension is bounded by one k-window per side.
    val planted = agg.collect {
      case ((1L, r), c) if r >= 16L && r <= 16L + 2 * 8 => c }.sum
    assert(planted == n / 10 - 1,
      s"planted-interval docs $planted != ${n / 10 - 1}: $agg")
    // the 90k unplanted docs (plus the planted first-occurrence) are
    // byte-for-byte clean: no random 8-gram collision at 5000^8 space
    assert(agg((0L, 0L)) == n - n / 10 + 1, agg.toString)
    assert(agg.keys.forall { case (iv, r) =>
      (iv == 0L && r == 0L) || (iv == 1L && r >= 16L && r <= 32L) },
      s"unexpected interval shapes: $agg")
  }

  test("m12 media delta: byte-identical, perturbed, and novel delta " +
    "assets verdict correctly against the persisted fingerprint index") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val probe = (0L until 300L).toDF("doc_id")
      .withColumn("is_delta",
        pmod(graft.functions.Portable.hash60(col("doc_id").cast("string"),
          424), lit(5L)) === 0L)
      .as[(Long, Boolean)].collect().toMap
    // the EXACT arm matches on (kind, checksum) and kind = media_id % 3,
    // so the planted exact/near partners must share the base's kind
    val baseIds = (0L until 300L).filter(id => !probe(id)).take(1)
    val sameKind = (0L until 300L)
      .filter(id => probe(id) && id % 3 == baseIds(0) % 3).take(2)
    val deltaIds = sameKind ++
      (0L until 300L).filter(id => probe(id) && !sameKind.contains(id)).take(1)
    // > 192 bytes so every aHash cell reads a distinct byte: a one-char
    // edit moves exactly one gray cell (plus bounded mean drift)
    val baseText = (0 until 80).map(i => s"w$i").mkString(" ")
    assert(baseText.length > 192)
    val perturbed = "W" + baseText.tail // first byte: inside the checksum
    val novel = (0 until 80).map(i => s"zz$i").mkString(" ")
    val docs = Seq(
      (baseIds(0), baseText),
      (deltaIds(0), baseText),   // byte-identical -> exact
      (deltaIds(1), perturbed),  // thumbnail differs, phash close -> near
      (deltaIds(2), novel))      // -> unique
    val dir = Files.createTempDirectory("mediadelta").toString
    docs.map { case (i, t) => (i, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.graft.m12.indexDir",
      Files.createTempDirectory("mediaidx").toString)
    try {
      val rows = SparkEntry.queries("m12_media_delta")(spark, dir)
        .select("media_id", "verdict", "winner", "hamming")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(rows.keySet == deltaIds.toSet)
      assert(rows(deltaIds(0)) == (("exact", baseIds(0), 0L)))
      val (v1, w1, h1) = rows(deltaIds(1))
      assert(v1 == "near" && w1 == baseIds(0) && h1 >= 1L && h1 <= 4L,
        s"perturbed asset got $v1/$w1/$h1")
      assert(rows(deltaIds(2)) == (("unique", -1L, -1L)))
    } finally spark.conf.unset("spark.graft.m12.indexDir")
  }

  test("t23 tokenizer artifact round-trip reproduces t16's in-query " +
    "accounting exactly, plus the stored merge count") {
    spark.conf.set("spark.graft.t23.tokenizerDir",
      Files.createTempDirectory("tok23").toString)
    try {
      val t16r = SparkEntry.queries("t16_bpe_compression")(spark, corpusDir)
        .collect()(0)
      val t23r = SparkEntry.queries("t23_tokenizer_store")(spark, corpusDir)
        .collect()(0)
      Seq("n_vocab_words", "n_word_occurrences", "tokens_before",
        "tokens_after", "compression_pm").foreach { c =>
        assert(t23r.getAs[Long](c) == t16r.getAs[Long](c),
          s"$c: artifact path ${t23r.getAs[Long](c)} != " +
            s"in-query ${t16r.getAs[Long](c)}")
      }
      assert(t23r.getAs[Long]("n_merges") == 6L) // default rounds, rich vocab
    } finally spark.conf.unset("spark.graft.t23.tokenizerDir")
  }

  test("t22 DSIR weights: hand-computed target-affinity on a mixed corpus") {
    val docs = Seq(
      (0L, "a b", "src0"),  // target
      (1L, "a b", "src5"),  // same bigram, outside the target
      (2L, "a c", "src5"))
    val dir = Files.createTempDirectory("dsir").toString
    docs.map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("t22_dsir_weights")(spark, dir)
      .select("doc_id", "n_trans", "sum_aff_pm", "aff_pm", "is_target")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // (a,b): c_r=2, c_t=1 -> 1000*2 DIV 3 = 666; (a,c): c_r=1, c_t=0 -> 500
    assert(rows(0L) == ((1L, 666L, 666L, 1L)))
    assert(rows(1L) == ((1L, 666L, 666L, 0L)))
    assert(rows(2L) == ((1L, 500L, 500L, 0L)))
  }

  test("t22 degenerates correctly when the target IS the corpus: every " +
    "affinity is exactly 1000 per-mille") {
    // corpusDir sources cycle src0/src1/src2 — all inside DsirTarget,
    // so c_t == c_r for every bigram and the smoothed ratio is 1
    val rows = SparkEntry.queries("t22_dsir_weights")(spark, corpusDir)
      .select("aff_pm", "is_target").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (aff, tgt) =>
      assert(aff == 1000L && tgt == 1L, s"aff $aff target $tgt")
    }
  }
}
