package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch ordering + token-balanced reader slicing — the
  * last mile between a served corpus and a distributed trainer's data
  * loaders.
  *
  * A training job wants, per epoch: (1) a GLOBAL shuffle of the corpus
  * that is deterministic (any worker can recompute any position — resume
  * after preemption without a stored order table), different per epoch,
  * and independent of cluster layout; (2) a split of that order into N
  * contiguous, token-balanced slices, one per data-loader rank, so every
  * rank does equal work and no document is read twice or skipped.
  *
  * Both come from identity hashing, the same discipline as the d15 split
  * and d13 mixture sampling: the epoch-`e` sort key of a document is the
  * portable 60-bit hash of its id under seed `SeedBase + e`
  * ([[graft.functions.Portable.hash60]] — engine-portable, so the DuckDB
  * oracle replays the exact order). No RNG state, no persisted
  * permutation — the order IS a pure function of (id, epoch).
  *
  * The global position/running-token-total over that order is the
  * classic global-rank problem. A naive
  * `row_number().over(Window.orderBy(key))` funnels the ENTIRE corpus
  * through one task's sort — the canonical 100 TB scale-killer. Instead
  * this uses [[PrefixSum.exclusiveMulti]]'s bucketed two-pass
  * decomposition with ONE constant partition key: the 60-bit hash is
  * uniform by construction, so fixed-width range buckets are
  * automatically balanced (the skew caveat in PrefixSum's scaladoc
  * cannot arise here), parallelism = the bucket count, and position +
  * token prefix compute together in a single pass. The hash is the
  * leading sort key and the unique id breaks the (astronomically rare
  * but possible) 60-bit collisions — `exclusiveMulti`'s `tie` column —
  * so the order is total and bit-stable across engines and runs.
  *
  * Slices: reader = `(N * tokens_before) DIV total_tokens` — monotone in
  * position (tokens_before is non-decreasing along the order), hence
  * contiguous per reader, and each slice holds ~`total/N` tokens (off by
  * at most one document). `tokens_before < total` for any document with
  * tokens after it, so the value is always in `[0, N)`; the `least`
  * guard only matters for zero-token documents at the very end of the
  * order.
  *
  * Reference: dewi-alliance/helium-etl-lite has no training-data
  * surface; this is part of the LLM-pipeline extension (SURVEY §2 —
  * t24/t25, the consumer side of t12's packing and the Corpus nights).
  */
object EpochFeed {

  /** Seed namespace for epoch keys — distinct from every other portable
    * seed in the repo (d13: 555/888, d15: 777, shards: 424…). */
  val SeedBase = 9000

  /** The epoch-`epoch` sort key of an id: portable 60-bit hash, uniform
    * over [0, 2^60). Pure codegen'd built-ins (md5/conv/substring). */
  def shuffleKey(id: Column, epoch: Int): Column =
    graft.functions.Portable.hash60(id.cast("string"), SeedBase + epoch)

  /** DuckDB fragment computing the same key (oracle twin). */
  def sqlShuffleKey(idExpr: String, epoch: Int): String =
    graft.functions.Portable.sqlHash60(idExpr, SeedBase + epoch)

  /** Seed namespace for per-epoch mixture sampling — distinct from the
    * order keys so "which docs an epoch SEES" and "in what order" are
    * independent coins. */
  val MixSeedBase = 8800

  /** Per-epoch deterministic mixture membership: doc kept in epoch `e`
    * iff `hash(id, MixSeedBase + e) mod 1000 < ratePm`. With per-source
    * rates (the d13 mixture-weights shape) this is the "epochs see
    * different subsets of the down-weighted sources" semantics a
    * training mixture wants: across epochs the samples are independent
    * coins per document, so E epochs at rate r cover `1 - (1-r)^E` of a
    * source instead of re-reading one frozen r-sample E times.
    * Up-weighting (rate > 1000‰) is NOT expressed here — repetition is
    * the trainer's epoch loop, not a sampling filter. Pure per-row
    * predicate; composes with [[feed]] by filtering before ordering. */
  def mixtureKeep(id: Column, ratePm: Column, epoch: Int): Column =
    graft.functions.Portable.hash60(id.cast("string"), MixSeedBase + epoch)
      .mod(lit(1000L)) < ratePm

  /** DuckDB fragment computing the same membership (oracle twin). */
  def sqlMixtureKeep(idExpr: String, ratePmExpr: String,
      epoch: Int): String =
    s"(${graft.functions.Portable.sqlHash60(idExpr, MixSeedBase + epoch)}" +
      s" % 1000 < $ratePmExpr)"

  /** Adds `shuffle_key` and `pos` (0-based global position in the
    * epoch's deterministic order). Input must have a unique integral
    * `idCol`. */
  def withOrder(docs: DataFrame, epoch: Int, idCol: String = "doc_id",
                buckets: Int = PrefixSum.DefaultBuckets): DataFrame =
    PrefixSum.exclusiveTied(
      docs.withColumn("shuffle_key", shuffleKey(col(idCol), epoch))
        .withColumn("__one", lit(1L))
        .withColumn("__g", lit(0)),
      "__g", "shuffle_key", idCol, "__one", "pos", buckets)
      .drop("__one", "__g")

  /** Adds `src_cum_before` — each document's exclusive running token
    * total WITHIN ITS SOURCE, taken in the epoch's shuffle order. This
    * is the primitive behind per-source token-BUDGET caps (the other
    * half of mixture design: rates say "keep 40‰ of source X", budgets
    * say "at most N tokens of source X per epoch"): filtering on
    * `src_cum_before < budget` keeps an epoch-seeded random sample of
    * the source truncated at the budget — deterministic, engine-
    * portable, different docs each epoch, overshooting by at most one
    * document. Per-source tied prefix sum: partition key = source
    * (low-cardinality — exactly the shape PrefixSum's bucketing
    * parallelizes), order = (shuffle_key, id). */
  def withSourceCum(docs: DataFrame, epoch: Int, tokCol: String,
      idCol: String = "doc_id", srcCol: String = "source",
      buckets: Int = PrefixSum.DefaultBuckets): DataFrame =
    PrefixSum.exclusiveTied(
      docs.withColumn("shuffle_key", shuffleKey(col(idCol), epoch)),
      srcCol, "shuffle_key", idCol, tokCol, "src_cum_before", buckets)

  /** Write the feed MATERIALIZED: one `reader=R` directory per rank,
    * rows in epoch order inside each file — the layout a data loader
    * reads strictly sequentially with zero join-back. One shuffle
    * (hash on the rank id, so all of a rank's rows land in one task →
    * exactly one file per rank dir) + an in-partition sort on
    * `(reader, pos)`; the leading `reader` key satisfies the dynamic-
    * partition writer's required ordering, so it inserts no sort of
    * its own that could disturb `pos` order. At 100 TB this is the
    * unavoidable cost of a physically shuffled corpus — one full
    * shuffle of the gated text, same class as the shard write.
    * Callers size `nReaders` so a rank's slice (~total/N tokens) fits
    * a task. */
  def writeMaterialized(feedDf: DataFrame, nReaders: Int,
      outDir: String): Unit =
    feedDf.drop("shuffle_key", "toks_before")
      .repartition(nReaders, col("reader"))
      .sortWithinPartitions(col("reader"), col("pos"))
      .write.mode("overwrite").partitionBy("reader").parquet(outDir)

  /** Read a feed artifact (assignment table or materialized corpus)
    * written by the Nightly feed CLI — the consumer face of the
    * `_FEED_COMMITTED` discipline: the marker is dropped before a
    * rewrite and stamped after, so a dir without it is in-flight or
    * torn and this read REFUSES it instead of serving a mix of old
    * and new files. Returns the frame plus the marker's spec string
    * (what flags produced the artifact — a trainer logs it beside the
    * run). */
  def readFeed(s: org.apache.spark.sql.SparkSession, outDir: String,
      epoch: Int): (DataFrame, String) = {
    val dir = s"$outDir/epoch=$epoch"
    val marker = new org.apache.hadoop.fs.Path(dir, "_FEED_COMMITTED")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      throw new IllegalStateException(
        s"feed artifact at $dir carries no _FEED_COMMITTED marker — " +
          "an in-flight or torn rewrite is not readable; re-run " +
          "'Nightly feed --out' for this epoch")
    val in = fs.open(marker)
    val spec =
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    (s.read.parquet(dir), spec)
  }

  /** The full feed frame: `shuffle_key`, `pos`, `toks_before` (exclusive
    * running token total in epoch order) and `reader` ∈ [0, nReaders) —
    * token-contiguous balanced slices. `tokCol` must be integral and
    * non-negative. Cost: one pass of the bucketed prefix-sum (position
    * and token total share it) + a 1-row broadcast for the grand total.
    *
    * The input subtree is evaluated by PrefixSum's three passes plus the
    * total — persist upstream if it is expensive (t25 pins the narrow
    * projection, the t12 discipline). */
  def feed(docs: DataFrame, epoch: Int, nReaders: Int, tokCol: String,
           idCol: String = "doc_id",
           buckets: Int = PrefixSum.DefaultBuckets): DataFrame = {
    require(nReaders >= 1, s"nReaders must be >= 1, got $nReaders")
    val ordered = PrefixSum.exclusiveMulti(
      docs.withColumn("shuffle_key", shuffleKey(col(idCol), epoch))
        .withColumn("__one", lit(1L))
        .withColumn("__g", lit(0)),
      "__g", "shuffle_key", Some(idCol),
      Seq("__one" -> "pos", tokCol -> "toks_before"), buckets)
    val tot = docs.agg(sum(col(tokCol)).cast("long").as("__tot"))
    ordered.crossJoin(broadcast(tot))
      .withColumn("reader",
        expr(s"least($nReaders - 1L, " +
          s"($nReaders * toks_before) DIV greatest(__tot, 1L))"))
      .drop("__one", "__g", "__tot")
  }
}
