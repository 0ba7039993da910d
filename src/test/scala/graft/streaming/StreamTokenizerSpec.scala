package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.helium.SparkSuite
import StreamTokenizer._

class StreamTokenizerSpec extends SparkSuite {
  import spark.implicits._

  test("tokenizeWord: greedy-leftmost sequential apply, including the " +
    "lhs=rhs contraction and rule composition") {
    assert(tokenizeWord("abab", IndexedSeq(("a", "b"))).toSeq ==
      Seq("ab", "ab"))
    // lhs = rhs: floor(run/2) pairwise contraction, leftmost first
    assert(tokenizeWord("aaa", IndexedSeq(("a", "a"))).toSeq ==
      Seq("aa", "a"))
    // a later rule consumes the product of an earlier one
    assert(tokenizeWord("abc", IndexedSeq(("a", "b"), ("ab", "c"))).toSeq ==
      Seq("abc"))
    // a rule absent from the word is the identity
    assert(tokenizeWord("xyz", IndexedSeq(("a", "b"))).toSeq ==
      Seq("x", "y", "z"))
  }

  test("stream tokenization under the trained table equals batch t16's " +
    "corpus accounting exactly") {
    implicit val sqlCtx = spark.sqlContext
    val vocabWords = Seq("alpha", "beta", "gamma", "delta", "alphabet",
      "betamax", "gamut", "alpine")
    val rnd = new scala.util.Random(41)
    val texts = (0 until 12).map { _ =>
      Seq.fill(20 + rnd.nextInt(20))(vocabWords(rnd.nextInt(vocabWords.size)))
        .mkString(" ")
    }
    // batch side: t16 over the corpus written as a documents table
    val dir = java.nio.file.Files.createTempDirectory("tokcorp").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t16 = graft.SparkEntry.queries("t16_bpe_compression")(spark, dir)
      .select("n_word_occurrences", "tokens_before", "tokens_after")
      .as[(Long, Long, Long)].collect().head
    // the served table: trained on the SAME aggregated vocabulary with
    // the same round count as t16's default chain
    val vocab = texts.flatMap("[a-z]+".r.findAllIn(_)).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toVector
    val (merges, _) = graft.operators.BpeTrainer.train(vocab, 6)
    val table = merges.map(m => (m.lhs, m.rhs))
    assert(table.nonEmpty, "fixture corpus learned no merges")

    val input = MemoryStream[Doc]
    val q = tokenize(input.toDS(), table)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tok_out").start()
    try {
      // two micro-batches — the map is stateless, every doc emits once
      input.addData(texts.take(5).zipWithIndex.map { case (t, i) =>
        Doc(i.toLong, t) }: _*)
      q.processAllAvailable()
      input.addData(texts.drop(5).zipWithIndex.map { case (t, i) =>
        Doc((i + 5).toLong, t) }: _*)
      q.processAllAvailable()
      val rows = spark.table("tok_out")
        .select("doc_id", "n_words", "n_chars", "n_tokens")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length == 12 && rows.map(_._1).distinct.length == 12)
      assert(rows.map(_._2).sum == t16._1, "word occurrences diverged")
      assert(rows.map(_._3).sum == t16._2, "char-token baseline diverged")
      assert(rows.map(_._4).sum == t16._3,
        s"post-merge token totals diverged: stream ${rows.map(_._4).sum} " +
          s"vs batch ${t16._3}")
      // the table actually compresses on this corpus
      assert(rows.map(_._4).sum < rows.map(_._3).sum)
    } finally q.stop()
  }

  test("loadMerges round-trips a t23 artifact: the frozen table equals " +
    "the trainer's, order included") {
    val vocab = Vector(("lower", 3L), ("lowest", 2L), ("newest", 5L),
      ("widest", 4L))
    val (merges, _) = graft.operators.BpeTrainer.train(vocab, 5)
    val table = merges.map(m => (m.lhs, m.rhs)).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("tokart").toString
    merges.map(m => (m.round, m.lhs, m.rhs, m.pairCount))
      .toDF("merge_round", "lhs", "rhs", "pair_count")
      .write.mode("overwrite").parquet(dir)
    val loaded = StreamTokenizer.loadMerges(spark, dir)
    assert(loaded == table, s"loaded $loaded != trained $table")
    // and the frozen table tokenizes identically to the live one
    assert(tokenizeWord("lowest", loaded).toSeq ==
      tokenizeWord("lowest", table).toSeq)
    // generation-store artifacts (t23's retrain discipline) load the
    // newest committed total; a second retrain supersedes the first
    val gdir = java.nio.file.Files.createTempDirectory("tokgen").toString
    def asDf(ms: Seq[graft.operators.BpeTrainer.Merge]) =
      ms.map(m => (m.round, m.lhs, m.rhs, m.pairCount))
        .toDF("merge_round", "lhs", "rhs", "pair_count")
    graft.operators.IndexGenerations.writeTotal(spark, gdir,
      asDf(merges.take(2)))
    assert(StreamTokenizer.loadMerges(spark, gdir) == table.take(2))
    graft.operators.IndexGenerations.writeTotal(spark, gdir, asDf(merges))
    assert(StreamTokenizer.loadMerges(spark, gdir) == table)
  }

  test("a mid-stream retrain neither changes in-flight accounting nor " +
    "goes unrecorded: rows carry the generation that produced them") {
    implicit val sqlCtx = spark.sqlContext
    val vocab = Vector(("lower", 3L), ("lowest", 2L), ("newest", 5L),
      ("widest", 4L))
    def asDf(ms: Seq[graft.operators.BpeTrainer.Merge]) =
      ms.map(m => (m.round, m.lhs, m.rhs, m.pairCount))
        .toDF("merge_round", "lhs", "rhs", "pair_count")
    val (merges, _) = graft.operators.BpeTrainer.train(vocab, 5)
    val gdir = java.nio.file.Files.createTempDirectory("tokretrain").toString
    graft.operators.IndexGenerations.writeTotal(spark, gdir,
      asDf(merges.take(1)))

    // the fleet resolves the table ONCE at startup, stamp included
    val (gen0, table0) = StreamTokenizer.loadMergesWithGen(spark, gdir)
    assert(gen0 == 0L && table0 == merges.take(1).map(m => (m.lhs, m.rhs)))
    val input = MemoryStream[Doc]
    val q = StreamTokenizer.tokenizeWithGen(input.toDS(), table0, gen0)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tok_gen_out").start()
    try {
      input.addData(Doc(1L, "lowest newest"))
      q.processAllAvailable()
      // RETRAIN lands mid-stream: a new committed total generation
      graft.operators.IndexGenerations.writeTotal(spark, gdir, asDf(merges))
      input.addData(Doc(2L, "lowest newest"))
      q.processAllAvailable()
      val rows = spark.table("tok_gen_out")
        .select("doc_id", "n_tokens", "tok_gen")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // in-flight accounting is FROZEN on the gen-0 table (identical
      // counts before and after the retrain)…
      assert(rows.length == 2 && rows(0)._2 == rows(1)._2,
        s"mid-stream retrain changed in-flight accounting: $rows")
      // …and every row RECORDS the table that produced it
      assert(rows.forall(_._3 == 0L), s"rows lost their stamp: $rows")
    } finally q.stop()
    // a restarted/new fleet resolves the retrained generation — and its
    // per-word counts can legitimately differ, the recorded stamp is
    // what makes the mixed accounting auditable
    val (gen1, table1) = StreamTokenizer.loadMergesWithGen(spark, gdir)
    assert(gen1 == 1L && table1 == merges.map(m => (m.lhs, m.rhs)))
    // flat artifacts carry the -1 sentinel stamp
    val flat = java.nio.file.Files.createTempDirectory("tokflat").toString
    asDf(merges).write.mode("overwrite").parquet(flat)
    assert(StreamTokenizer.loadMergesWithGen(spark, flat)._1 == -1L)
  }

  test("the t23 artifact rows carry their generation number, advancing " +
    "per retrain") {
    val dir = java.nio.file.Files.createTempDirectory("t23gen").toString
    spark.conf.set("spark.graft.t23.tokenizerDir", dir)
    try {
      val corp = java.nio.file.Files.createTempDirectory("t23corp").toString
      val rnd = new scala.util.Random(7)
      val vocabWords = Seq("alpha", "beta", "gamma", "delta", "alphabet")
      (0 until 8).map { i =>
        (i.toLong,
          Seq.fill(15)(vocabWords(rnd.nextInt(vocabWords.size)))
            .mkString(" "),
          "en", s"src${i % 2}", 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$corp/documents.parquet")
      graft.SparkEntry.queries("t23_tokenizer_store")(spark, corp).count()
      graft.Pinned.releaseAll(spark)
      val g0 = spark.read.parquet(s"$dir/gen=0")
        .select("artifact_gen").distinct().as[Long].collect().toSeq
      assert(g0 == Seq(0L), s"gen-0 artifact stamped $g0")
      // the retrain: a second t23 run lands as generation 1, stamped 1
      graft.SparkEntry.queries("t23_tokenizer_store")(spark, corp).count()
      graft.Pinned.releaseAll(spark)
      val g1 = spark.read.parquet(s"$dir/gen=1")
        .select("artifact_gen").distinct().as[Long].collect().toSeq
      assert(g1 == Seq(1L), s"gen-1 artifact stamped $g1")
    } finally spark.conf.unset("spark.graft.t23.tokenizerDir")
  }
}
