package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{TextFns, TopKAgg}
import graft.helium.SparkSuite
import graft.streaming.StreamPacker

/** Property-based invariants for the round-4 training-data operators:
  * random inputs through the real Spark expressions, compared against
  * plain-Scala reference computations (the same fixed-seed sampling
  * discipline as helium.PropertySpec). */
class TrainingOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  /** Clean-room textbook BPE (Sennrich et al.): two-pointer greedy scan
    * for merge application, full pair recount per round — the reference
    * the distributed fold/argmax implementation must reproduce. */
  private def referenceBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, String, Long)] = {
    var seqs = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to rounds).flatMap { r =>
      val counts = seqs.toSeq.flatMap { case (s, c) =>
        s.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      if (counts.isEmpty) Nil
      else {
        val ((a, b), n) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
        seqs = seqs.map { case (s, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == a && s(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += s(i); i += 1 }
          }
          (out.toVector, c)
        }
        Seq((r.toLong, a, b, n))
      }
    }
  }

  test("bpeMerges matches the textbook scan on the classic fixture and random corpora") {
    // the Sennrich toy corpus: forces multi-round structure (es -> est)
    // and exercises the lhs=rhs run case via 'aaaa'
    val fixtures = Seq(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      Map("aaaa" -> 3L, "aab" -> 2L, "ba" -> 7L),
    ) ++ samples(
      Gen.mapOfN(8, Gen.zip(
        Gen.chooseNum(1, 8).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
        Gen.chooseNum(1L, 9L))), 4).filter(_.nonEmpty)
    fixtures.foreach { words =>
      val df = words.toSeq.toDF("word", "cnt")
      val got = graft.queries.TextDedupOps.bpeMerges(df, 4)
        .as[(Long, String, String, Long)].collect().sortBy(_._1)
      val expect = referenceBpe(words, 4)
      assert(got.toSeq == expect,
        s"words=$words\n got=${got.toSeq}\n want=$expect")
    }
  }

  test("t16 compression accounting equals the clean-room BPE applied to the real corpus") {
    val sf = "/root/testdata/sf0.001"
    // independent word extraction + merge application in plain Scala
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    // replay the reference merges, tracking final sequence lengths
    var seqs = words.map { case (w, c) => (w, w.map(_.toString).toVector, c) }
    (1 to 6).foreach { _ =>
      val counts = seqs.flatMap { case (_, s, c) =>
        s.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        seqs = seqs.map { case (w, s, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == a && s(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += s(i); i += 1 }
          }
          (w, out.toVector, c)
        }
      }
    }
    val before = seqs.map { case (w, _, c) => c * w.length }.sum
    val after = seqs.map { case (_, s, c) => c * s.size }.sum
    val row = SparkEntry.queries("t16_bpe_compression")(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_vocab_words") == seqs.size.toLong)
    assert(row.getAs[Long]("tokens_before") == before)
    assert(row.getAs[Long]("tokens_after") == after,
      s"distributed merge application diverged from the textbook scan: $row")
    assert(row.getAs[Long]("compression_pm") == 1000L * after / before)
    // the learned merges must actually compress a natural-language corpus
    assert(after < before, "6 merge rounds compressed nothing")
  }

  test("modeCount fold equals the true mode count on random arrays " +
    "(incl. empties, negatives, all-equal)") {
    val arrGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-3L, 6L))) // tight range forces runs
    val arrays = samples(arrGen, 12) ++
      Seq(Nil, List(7L), List(-1L, -1L, 5L), List.fill(9)(2L))
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
      .withColumn("mc", TextFns.modeCount(col("arr")))
    val got = df.select("id", "mc").as[(Long, Long)].collect().toMap
    arrays.zipWithIndex.foreach { case (a, i) =>
      val expect =
        if (a.isEmpty) 0L
        else a.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i.toLong) == expect,
        s"arr=$a fold=${got(i.toLong)} true=$expect")
    }
  }

  test("SpaceSaving eviction regime: bounds hold and heavy hitters survive " +
    "on skewed streams, across random partitionings") {
    // zipf-ish skew over a vocabulary far above capacity
    val itemGen = Gen.frequency(
      (40, Gen.const("hh1")), (25, Gen.const("hh2")), (15, Gen.const("hh3")),
      (20, Gen.chooseNum(0, 200).map(i => s"tail$i")))
    val streamGen = Gen.chooseNum(400, 800).flatMap(Gen.listOfN(_, itemGen))
    samples(streamGen, 5).zipWithIndex.foreach { case (items, si) =>
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val capacity = 16
      // random partitioning: distributed reduce+merge order varies per rep
      Seq(1, 4, 13).foreach { parts =>
        val agg = new TopKAgg(capacity)
        val summaries = items.zipWithIndex
          .groupBy(_._2 % parts).values.toSeq
          .map(part => part.map(_._1).foldLeft(agg.zero)(agg.reduce))
        val merged = summaries.reduce(agg.merge)
        val out = agg.finish(merged)
        assert(out.size <= capacity)
        // per-entry bounds: lb <= true <= est
        out.foreach { e =>
          val t = truth.getOrElse(e.item, 0L)
          assert(e.lb <= t && t <= e.est,
            s"sample $si parts=$parts item=${e.item} lb=${e.lb} true=$t est=${e.est}")
        }
        // guaranteed presence: true count > n/capacity must be in summary
        val n = items.size
        truth.filter(_._2 > n.toLong / capacity).keys.foreach { hh =>
          assert(out.exists(_.item == hh),
            s"sample $si parts=$parts heavy hitter $hh missing")
        }
      }
    }
  }

  /** Clean-room d23: global first-occurrence per k-gram in (doc, pos)
    * order, later occurrences anchor, anchors merge into intervals when
    * starts differ by ≤ k. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def referenceSubstrDedup(docs: Seq[(Long, Vector[String])], k: Int)
      : Map[Long, (Long, Long, Long, String)] = {
    val firstPk = scala.collection.mutable.Map.empty[Seq[String], Long]
    val anchors = scala.collection.mutable.Map
      .empty[Long, Vector[Int]].withDefaultValue(Vector.empty)
    docs.sortBy(_._1).foreach { case (id, toks) =>
      (0 to toks.size - k).foreach { i =>
        val g = toks.slice(i, i + k)
        val pk = id * 1000000000L + i
        firstPk.get(g) match {
          case None => firstPk(g) = pk
          case Some(f) if pk > f => anchors(id) = anchors(id) :+ i
          case _ => ()
        }
      }
    }
    docs.map { case (id, _) =>
      val as = anchors(id)
      if (as.isEmpty) id -> ((0L, 0L, 0L,
        md5Hex("")))
      else {
        val ivs = as.tail.foldLeft(Vector((as.head, as.head + k - 1))) {
          case (acc, i) =>
            val (s0, e0) = acc.last
            if (i <= s0 + k) acc.init :+ ((s0, i + k - 1))
            else acc :+ ((i, i + k - 1))
        }
        id -> ((as.size.toLong, ivs.size.toLong,
          ivs.map { case (s, e) => (e - s + 1).toLong }.sum,
          md5Hex(
            ivs.map { case (s, e) => s"$s:$e" }.mkString(","))))
      }
    }.toMap
  }

  test("d23 equals the clean-room substring dedup on random small-vocab " +
    "corpora (collisions forced)") {
    val k = graft.queries.TextDedupOps.SubstrK
    // 3-word vocabulary: k-gram collisions everywhere, within-doc
    // repeats common — the interval-merge algebra is fully exercised
    val docGen = Gen.chooseNum(0, 26).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "z")).map(_.toVector))
    (0 until 3).foreach { round =>
      val docs = samples(docGen, 30).zipWithIndex
        .map { case (t, i) => (i.toLong + round * 100, t) }
      val dir = java.nio.file.Files
        .createTempDirectory(s"substrprop$round").toString
      docs.map { case (id, t) =>
        (id, t.mkString(" "), "en", s"src${id % 3}", t.size.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("d23_substring_dedup")(spark, dir)
        .select("doc_id", "n_anchors", "n_intervals", "n_removed", "iv_md5")
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val want = referenceSubstrDedup(docs, k)
      assert(got == want,
        s"round $round diff: ${(got.toSet -- want.toSet).take(3)} vs " +
          s"${(want.toSet -- got.toSet).take(3)}")
    }
  }

  test("streaming packing equals the batch rule for random docs and " +
    "random micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val budget = 50L
    val docsGen = for {
      n <- Gen.chooseNum(1, 25)
      docs <- Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        toks <- Gen.chooseNum(1L, 80L) // some docs exceed the budget
      } yield (src, toks))
      cut1 <- Gen.chooseNum(0, n)
      cut2 <- Gen.chooseNum(0, n)
    } yield (docs.zipWithIndex.map { case ((s, t), i) =>
      StreamPacker.Doc(s, i.toLong, t)
    }, math.min(cut1, cut2), math.max(cut1, cut2))

    samples(docsGen, 4).zipWithIndex.foreach { case ((docs, c1, c2), si) =>
      val input = MemoryStream[StreamPacker.Doc]
      val q = StreamPacker.pack(input.toDS(), budget).writeStream
        .outputMode(OutputMode.Append())
        .format("memory").queryName(s"prop_pack_$si").start()
      try {
        // docs arrive in doc_id order across batches (the agreement
        // precondition), split at two random cut points
        Seq(docs.slice(0, c1), docs.slice(c1, c2), docs.slice(c2, docs.size))
          .filter(_.nonEmpty).foreach { b =>
            input.addData(b: _*); q.processAllAvailable()
          }
        val got = spark.table(s"prop_pack_$si")
          .select("source", "doc_id", "bin", "offset_in_bin")
          .as[(String, Long, Long, Long)].collect().toSet
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val expect = docs.toDS().toDF()
          .withColumn("cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
          .select(col("source"), col("doc_id"),
            expr(s"cum DIV $budget").as("bin"),
            expr(s"cum % $budget").as("offset_in_bin"))
          .as[(String, Long, Long, Long)].collect().toSet
        assert(got == expect, s"sample $si: $got vs $expect")
        // invariants: offsets stay inside the budget, bins non-decreasing
        // per source in doc_id order
        assert(got.forall { case (_, _, _, off) => off >= 0 && off < budget })
        got.groupBy(_._1).values.foreach { g =>
          val bins = g.toSeq.sortBy(_._2).map(_._3)
          assert(bins == bins.sorted, s"bins regressed: $bins")
        }
      } finally q.stop()
    }
  }

  test("epoch feed invariants hold for random corpora, reader counts, " +
    "and epochs: permutation, contiguity, balance, rank coverage") {
    val gen = for {
      n <- Gen.chooseNum(20, 400)
      readers <- Gen.chooseNum(1, 13)
      epoch <- Gen.chooseNum(1, 9)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 40L)) // zero-token docs too
    } yield (n, readers, epoch, toks)
    samples(gen, 5).zipWithIndex.foreach {
      case ((n, readers, epoch, toks), si) =>
        val d = toks.zipWithIndex
          .map { case (t, i) => (i.toLong * 7 + 3, s"s${i % 3}", t) }
          .toDF("doc_id", "source", "n_toks")
        val rows = graft.operators.EpochFeed
          .feed(d, epoch, readers, "n_toks")
          .select("doc_id", "pos", "reader", "n_toks")
          .as[(Long, Long, Long, Long)].collect()
        assert(rows.length == n, s"sample $si lost docs")
        assert(rows.map(_._2).sorted.toSeq == (0L until n.toLong),
          s"sample $si: positions not a permutation")
        val byPos = rows.sortBy(_._2)
        assert(byPos.map(_._3).sliding(2)
          .forall(p => p.length < 2 || p(0) <= p(1)),
          s"sample $si: a reader slice is not contiguous")
        assert(rows.forall(r => r._3 >= 0 && r._3 < readers),
          s"sample $si: rank out of range")
        val total = rows.map(_._4).sum
        if (total > 0) {
          val maxTok = rows.map(_._4).max
          val perRank = (0L until readers.toLong).map(r =>
            rows.filter(_._3 == r).map(_._4).sum)
          perRank.zipWithIndex.foreach { case (t, r) =>
            assert(math.abs(t - total / readers) <= 2 * maxTok + 1,
              s"sample $si: rank $r holds $t of $total over $readers")
          }
        }
    }
  }
}
