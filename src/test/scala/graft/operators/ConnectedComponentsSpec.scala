package graft.operators

import graft.helium.SparkSuite

/** [[ConnectedComponents]] — the pairs→clusters step of the dedup suite. */
class ConnectedComponentsSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  /** Runs BOTH execution paths — driver union-find (default cutoff) and
    * distributed propagation (cutoff 0) — and asserts they agree before
    * returning the labeling. */
  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val local = ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val distributed = ConnectedComponents
      .run(edges.toDF("src", "dst"), localCutoff = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == distributed,
      s"local union-find and distributed propagation disagree: " +
        s"${local.toSet -- distributed.toSet} vs ${distributed.toSet -- local.toSet}")
    local
  }

  test("three separate components resolve to their min ids") {
    val m = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges (diameter > 1 rounds)") {
    // 0-1-2-...-12 as a path: worst case for min-propagation depth
    val edges = (0L until 12L).map(i => (i, i + 1))
    val m = comps(edges)
    assert(m.size == 13 && m.values.forall(_ == 0L))
  }

  test("local path survives a deep chain inserted in worst-case order") {
    import spark.implicits._
    // reversed insertion builds maximal parent chains before compression —
    // the order that overflowed the stack with a recursive find. Local
    // path only: a 100k-diameter chain is exactly what the distributed
    // propagation is NOT for (it would need 100k rounds).
    val n = 100000L
    val edges = (n - 1 to 0L by -1).map(i => (i, i + 1))
    val m = ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(m.size == n + 1 && m.values.forall(_ == 0L))
  }

  test("empty edge input returns an empty labeling (no NPE)") {
    // regression: sum over an empty frame is NULL; the convergence
    // certificate must coalesce it, not NPE — a corpus with zero near-dup
    // pairs is a legal d06 input
    assert(comps(Seq.empty).isEmpty)
  }

  test("orientation and duplicate edges are irrelevant") {
    val m1 = comps(Seq((5L, 9L), (9L, 5L), (5L, 9L), (9L, 7L)))
    assert(m1 == Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
  }

  test("random graphs match a union-find reference (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(25 + rnd.nextInt(30))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      // find() path-compresses to the root, which by construction is the
      // min id of the component (we always attach max under min)
      assert(comps(edges) == expected)
    }
  }

  test("large-star/small-star: deep chain converges in O(log n) rounds, " +
    "labels identical to union-find") {
    import spark.implicits._
    // a 1000-node path is the adversarial case: min-propagation needs
    // ~1000 rounds (diameter), the star algorithm must stay logarithmic
    val n = 1000L
    val edges = (0L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents
      .runStarCounting(edges, "src", "dst", maxRounds = 50, localCutoff = 0)
    assert(rounds > 0, "size gate must not have answered locally")
    // Kiveris et al. prove O(log n) large+small rounds; assert a generous
    // concrete bound so a regression to diameter-rounds fails loudly
    assert(rounds <= 2 * (64 - java.lang.Long.numberOfLeadingZeros(n)),
      s"chain of $n took $rounds rounds — not logarithmic")
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == n + 1 && m.values.forall(_ == 0L))
  }

  test("large-star/small-star agrees with run() on random graphs (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(25 + rnd.nextInt(30))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val viaRun = comps(edges)
      val viaStarDist = ConnectedComponents
        .runStar(edges.toDF("src", "dst"), localCutoff = 0)
        .as[(Long, Long)].collect().toMap
      val viaStarLocal = ConnectedComponents
        .runStar(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(viaStarDist == viaRun && viaStarLocal == viaRun)
    }
  }

  test("an exhausted round budget throws instead of returning under-merged labels") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    // 40-hop diameter cannot converge in 2 min-label rounds, and a
    // 41-node path needs ≥2 star rounds — both must refuse, not return
    intercept[IllegalStateException] {
      ConnectedComponents.run(chain, maxRounds = 2, localCutoff = 0).collect()
    }
    intercept[IllegalStateException] {
      ConnectedComponents.runStar(chain, maxRounds = 1, localCutoff = 0).collect()
    }
  }

  test("large-star/small-star handles empty input and isolated pairs") {
    import spark.implicits._
    assert(ConnectedComponents
      .runStar(Seq.empty[(Long, Long)].toDF("src", "dst"), localCutoff = 0)
      .count() == 0)
    val m = ConnectedComponents
      .runStar(Seq((4L, 2L), (9L, 8L)).toDF("src", "dst"), localCutoff = 0)
      .as[(Long, Long)].collect().toMap
    assert(m == Map(2L -> 2L, 4L -> 2L, 8L -> 8L, 9L -> 8L))
  }

  test("hot-key isolation: star graph labels identical to union-find, " +
    "per-task join input provably smaller") {
    import spark.implicits._
    // one mega-component: hub 0 with 30k leaves — every edge carries the
    // hub on one side, so the ordinary per-round join lands all 30k rows
    // on one sort-merge task; plus a small control component
    val n = 30000L
    val edges = ((1L to n).map(i => (0L, i)) ++ Seq((50001L, 50002L)))
      .toDF("src", "dst")
    val expected = (0L to n).map(i => i -> 0L).toMap ++
      Map(50001L -> 50001L, 50002L -> 50001L)

    // task-level shuffle-read record peaks, captured per run
    class Peak extends org.apache.spark.scheduler.SparkListener {
      val max = new java.util.concurrent.atomic.AtomicLong(0)
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null)
          max.getAndUpdate(math.max(_, m.shuffleReadMetrics.recordsRead))
      }
    }
    def measuredRun(hotDegree: Long): (Map[Long, Long], Long) = {
      val l = new Peak
      spark.sparkContext.addSparkListener(l)
      spark.conf.set("spark.graft.cc.hotDegree", hotDegree.toString)
      // force the skew to be visible at test scale: no auto-broadcast of
      // the labels side (at 100 TB it is genuinely unbroadcastable) and
      // no AQE coalescing/skew handling masking the contrast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val m = ConnectedComponents.run(edges, localCutoff = 0)
          .as[(Long, Long)].collect().toMap
        // listener events drain asynchronously; poll until the peak
        // stabilizes (bounded) instead of reaching into private APIs
        var (last, stable, waited) = (-1L, 0, 0)
        while (stable < 3 && waited < 5000) {
          Thread.sleep(100); waited += 100
          val cur = l.max.get()
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        (m, l.max.get())
      } finally {
        spark.conf.unset("spark.graft.cc.hotDegree")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.sparkContext.removeSparkListener(l)
      }
    }
    val (plain, peakPlain) = measuredRun(hotDegree = Long.MaxValue)
    val (isolated, peakIso) = measuredRun(hotDegree = 1000L)
    assert(plain == expected && isolated == expected,
      "hot-key isolation changed the labeling")
    // the hub's 30k rows ride one task when not isolated; once isolated
    // they go through a broadcast join and never shuffle, leaving only
    // the even base load. Assert a 2x peak improvement so the test
    // tolerates scheduling noise but fails if the hot key still
    // concentrates
    assert(peakIso * 2 <= peakPlain,
      s"isolation did not bound the hot task: isolated=$peakIso plain=$peakPlain")
  }

  test("d06 components agree with d05 pairs: every near-dup pair shares a component") {
    val sf = "/root/testdata/sf0.01"
    val pairs = graft.SparkEntry.queries("d05_ngram_jaccard_exact")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val comp = graft.SparkEntry.queries("d06_neardup_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
    // every component label is the min member id (canonical survivor)
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label)
    }
  }
}
