package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale rehearsal — the one executable answer to "would this still
  * run at the next order of magnitude": generates a synthetic corpus 10×
  * the sf0.1 documents table (50k docs, distinct ids, per-copy token
  * variation so exact dedup keeps a realistic survivor ratio), then runs
  * the two production lifecycles end to end —
  *
  *  1. the composed p01 corpus build (exact dedup → span dedup →
  *     decontamination → quality gates → packing → shard write), and
  *  2. the d24 delta-dedup cycle against its generation-store index
  *     (build + serve + one [[graft.queries.TextDedupOps.d24Advance]]
  *     night),
  *
  * and prints ONE JSON line with row counts and wall times. The caller
  * (ScaleRehearsalSpec, env-gated) forks this main into its own JVM
  * with the heap pinned LOW — completion under a small driver bound is
  * the assertion: nothing in either pipeline may collect corpus-scale
  * state driver-side. Run directly via
  * `SPARK_DRIVER_MEM=2g sbt "runMain graft.ScaleRehearsal /tmp/dir"`. */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      sys.props("java.io.tmpdir") + "/graft_scale_rehearsal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same iteration knob as Bench/Verify: SPARK_GRAFT_CONF=k=v,k=v —
    // e.g. spark.graft.index.advanceMode=delta rehearses the LSM path
    SparkEntry.applyEnvConf(spark)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- 10× corpus: union ten re-keyed copies of sf0.1, each copy's
    // text perturbed by a copy-tag token so the dup structure stays
    // realistic (cross-copy near-dups, not 90% exact dups) ---
    val sfDocs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
    val n = sfDocs.count()
    val dir = s"$work/sf1x10"
    val (_, genSecs) = timed {
      (0 until 10).map { c =>
        sfDocs.select(
          (col("doc_id") + lit(c * n)).as("doc_id"),
          (if (c == 0) col("text")
           else concat(lit(s"copyvariant$c "), col("text"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    // --- p01 composed build over the 10× corpus ---
    spark.conf.set("spark.graft.p01.outDir", s"$work/shards")
    val (p01Rows, p01Secs) = timed {
      val r = SparkEntry.queries("p01_corpus_pipeline")(spark, dir).count()
      Pinned.releaseAll(spark)
      r
    }

    // --- d24 delta cycle: build + serve, then one advance night ---
    spark.conf.set("spark.graft.d24.indexDir", s"$work/d24_index")
    val (d24Rows, d24Secs) = timed {
      val r = SparkEntry.queries("d24_delta_dedup")(spark, dir).count()
      Pinned.releaseAll(spark)
      r
    }
    val (advRows, advSecs) = timed {
      // tomorrow's crawl: a re-keyed perturbed slice of today's corpus
      val delta = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + lit(10L * n)).as("doc_id"),
          concat(lit("nightly "), col("text")).as("text"), col("source"))
      val r = graft.queries.TextDedupOps
        .d24Advance(spark, s"$work/d24_index", delta).count()
      Pinned.releaseAll(spark)
      r
    }

    val mx = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"metric":"scale_rehearsal","docs":${10 * n},""" +
      s""""heap_mb":$mx,"gen_secs":$genSecs,""" +
      s""""p01_rows":$p01Rows,"p01_secs":$p01Secs,""" +
      s""""d24_rows":$d24Rows,"d24_secs":$d24Secs,""" +
      s""""adv_rows":$advRows,"adv_secs":$advSecs}""")
    spark.stop()
  }
}
