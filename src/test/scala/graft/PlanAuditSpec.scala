package graft

import graft.helium.SparkSuite

/** Physical-plan assertions for the round-2 operators: the point is not
  * just that results match the oracle but that Catalyst produced the plan
  * each query was designed around (SURVEY §4 discipline — "the plan you'd
  * want, not the first one that passed"). */
class PlanAuditSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q28 grouping sets compiles to one Expand over a single scan") {
    val p = plan("q28_grouping_sets")
    assert(p.contains("Expand"), s"no Expand in:\n$p")
    // one pass over customer: the fact table is scanned once, not per set
    assert("customer\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("q29/q32 window frames shuffle once on the partition key") {
    Seq("q29_running_total", "q32_first_last_event").foreach { q =>
      val p = plan(q)
      assert(p.contains("Window"), s"$q lost its window:\n$p")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1, s"$q has $exchanges shuffles, want 1:\n$p")
    }
  }

  test("q29 pushes the suppkey filter into the parquet scan") {
    val p = plan("q29_running_total")
    assert(p.contains("PushedFilters") || p.contains("Filter"), p)
    // projection pruning: only the 4 needed columns are read
    assert(!p.contains("l_extendedprice"), s"scan reads unneeded columns:\n$p")
  }

  test("q31 pivot is a single aggregate, no per-value passes") {
    val p = plan("q31_pivot_status")
    assert("orders\\.parquet".r.findAllIn(p).size == 1,
      s"pivot should scan orders once:\n$p")
  }

  test("d07 hamming join is hash-based — no nested loop, no cartesian") {
    val p = plan("d07_simhash_hamming")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d07 degenerated to all-pairs:\n$p")
  }

  test("h05/q33 broadcast the small side of their joins") {
    Seq("h05_rewards_txn_join", "q33_cohort_retention").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
    }
  }

  test("star join q04 broadcasts every dimension") {
    val p = plan("q04_star_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q34 RANGE frame shuffles once on user_id") {
    val p = plan("q34_trailing_window")
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"q34 should shuffle exactly once:\n$p")
  }

  test("q35 sample filter runs before the aggregate, single scan") {
    val p = plan("q35_stratified_sample")
    assert(p.contains("Filter"), s"sample predicate missing:\n$p")
    assert("orders\\.parquet".r.findAllIn(p).size == 1, p)
    // projection pruning: o_comment is never read
    assert(!p.contains("o_comment"), s"scan reads unneeded columns:\n$p")
  }

  test("s06 broadcasts the centroid side (bounded by label cardinality)") {
    val p = plan("s06_centroid_assign")
    // crossJoin(broadcast(cents)) against 10 centroid rows IS the intended
    // broadcast nested-loop: per-row argmax over a tiny broadcast list
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s06 lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q38 IGNORE NULLS navigation shuffles once on user_id") {
    val p = plan("q38_ignore_nulls_nav")
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("d09 typed Aggregator runs with map-side partial aggregation") {
    val p = plan("d09_source_signatures")
    // partial + final ObjectHashAggregate around one exchange: the shuffle
    // carries k-long signature buffers per source, not shingle sets
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregation:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q40 EXISTS decorrelates to a hash semi-join, not a nested loop") {
    val p = plan("q40_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS not decorrelated:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("q43 ranking family computes all five functions in one Window over one shuffle") {
    val p = plan("q43_rank_family")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Window".r.findAllIn(p).size >= 1, p)
  }

  test("q44 unpivot expands AFTER the aggregate (no fact-table expand)") {
    val p = plan("q44_unpivot_metrics")
    assert(p.contains("Expand"), p)
    // the Expand must sit above the aggregate: exactly one scan, and the
    // aggregate appears below the expand in the plan tree (printed above it)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("q23 range join rides the equi key — no nested loop") {
    val p = plan("q23_range_join_shipwindow")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range predicate degenerated to all-pairs:\n$p")
  }

  test("m04 cross-modal join never shuffles the binary payload") {
    val p = plan("m04_crossmodal_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the payload column must not appear in any exchange: features are
    // extracted before the join, so only narrow rows move
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("payload"), s"payload in a shuffle:\n$exchanges")
  }

  test("t10 repetition rules: per-row fold means no join, one aggregation shuffle") {
    val p = plan("t10_repetition_rules")
    assert(!p.contains("Join"), s"t10 regressed to the join-back mode plan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"t10 should shuffle once (source rollup):\n$p")
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("t12 sequence packing: bucketed prefix sum — no per-source-only " +
    "ordered window, no global sort, offsets broadcast back") {
    val p = plan("t12_sequence_packing")
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      s"t12 must not globally sort:\n$p")
    // the scale pin: every ordered window over the FULL data (the ones
    // sorting by doc_id) must partition on (source, bucket), never on
    // source alone — a source-only window serializes a whole source
    // through one task at 100 TB. The only source-partitioned window
    // allowed is the per-bucket offsets pass, which orders by __bkt over
    // the tiny sources × buckets subtotal frame.
    assert("windowspecdefinition\\(source#\\d+, doc_id".r.findFirstIn(p).isEmpty,
      s"t12 regressed to the per-source ordered window:\n$p")
    assert("windowspecdefinition\\(source#\\d+, __bkt#\\d+L?, doc_id".r
      .findFirstIn(p).isDefined,
      s"t12 lost the bucket-local window:\n$p")
    // range probe and offsets ride back on broadcasts, not shuffles
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"t12 lost its range/offset broadcasts:\n$p")
  }

  test("t24/t25 epoch feed: global rank WITHOUT a global sort — windows " +
    "partition on the range bucket, side frames broadcast") {
    for (name <- Seq("t24_epoch_order", "t25_reader_slices")) {
      val p = plan(name)
      // the whole point: no rangepartitioning exchange anywhere — a
      // row_number().over(orderBy(key)) formulation would globally sort
      assert(!p.contains("Exchange rangepartitioning"),
        s"$name globally sorts:\n$p")
      // the data window partitions on the bucket and orders by
      // (shuffle_key, doc_id) — the tie-broken bucket-local rank
      assert(("windowspecdefinition\\(__bkt#\\d+L?, shuffle_key#\\d+L?" +
        " ASC NULLS FIRST, doc_id").r.findFirstIn(p).isDefined,
        s"$name lost the bucket-local tied window:\n$p")
      // range probe + per-bucket offsets come back as broadcasts
      assert("BroadcastExchange".r.findAllIn(p).size >= 2,
        s"$name lost its range/offset broadcasts:\n$p")
    }
  }

  test("t26 sequence materialization rides t12's packing plan — " +
    "bucket-local windows, and the only aggregation state is per-bin") {
    val p = plan("t26_packed_sequences")
    assert(!p.contains("Exchange rangepartitioning"),
      s"t26 must not globally sort:\n$p")
    assert("windowspecdefinition\\(source#\\d+, doc_id".r.findFirstIn(p).isEmpty,
      s"t26 regressed to the per-source ordered window:\n$p")
    assert("windowspecdefinition\\(source#\\d+, __bkt#\\d+L?, doc_id".r
      .findFirstIn(p).isDefined,
      s"t26 lost the bucket-local window:\n$p")
    // the concat groups by (source, bin) — budget-bounded state, and
    // collect_list must aggregate there, not in a window over the corpus
    assert(p.contains("collect_list"), p)
  }

  test("p05 composed hand-off: two prefix-sum chains, still no global " +
    "sort and no per-source-only ordered window") {
    val p = plan("p05_training_epoch")
    assert(!p.contains("Exchange rangepartitioning"),
      s"p05 globally sorts:\n$p")
    // budget stage: per-(source, bucket) windows only
    assert("windowspecdefinition\\(source#\\d+, shuffle_key".r
      .findFirstIn(p).isEmpty,
      s"p05's budget stage regressed to the per-source-only window:\n$p")
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"p05 lost its range/offset/total broadcasts:\n$p")
  }

  test("p01 packing stage: no per-source-only ordered window either") {
    val p = graft.queries.TextDedupOps.p01Corpus(spark, sf)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(source#\\d+, doc_id".r.findFirstIn(p).isEmpty,
      s"p01 packing regressed to the per-source ordered window:\n$p")
    assert("windowspecdefinition\\(source#\\d+, __bkt#\\d+L?, doc_id".r
      .findFirstIn(p).isDefined,
      s"p01 packing lost the bucket-local window:\n$p")
  }

  test("s09 embedding screen: single scan, one rollup shuffle, no join") {
    val p = plan("s09_embedding_quality")
    assert(!p.contains("Join"), p)
    assert("embeddings\\.parquet".r.findAllIn(p).size == 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("t13 sketch aggregates map-side: partial_topkagg before the exchange") {
    val p = plan("t13_heavy_hitters")
    assert(p.contains("partial_topkagg"),
      s"TopKAgg lost its partial (map-side) aggregation:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("d12 contamination: semi join stays hash-based, no all-pairs") {
    val p = plan("d12_contamination")
    assert(p.contains("LeftSemi"), s"semi join shape lost:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s10 PQ assignment: codebook broadcasts, argmin is one window shuffle") {
    val p = plan("s10_pq_assign")
    assert(p.contains("BroadcastHashJoin"), s"codebook join lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("s11 banded near-dup: hash joins only — the cartesian s04 carries is gone") {
    val p = plan("s11_embedding_lsh_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"s11 degenerated to all-pairs:\n$p")
    // s04, by contrast, IS the intentional cartesian audit
    val audit = plan("s04_embedding_neardup")
    assert(audit.contains("CartesianProduct") ||
      audit.contains("BroadcastNestedLoopJoin"), audit)
  }

  test("d11 shingle census: two narrow shuffles, shingles never rejoin text") {
    val p = plan("d11_shingle_df_histogram")
    assert(!p.contains("Join"), p)
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"d11 wants df + bucket shuffles, got $exchanges:\n$p")
  }

  test("d15 split assignment: no join, one aggregation shuffle, one scan") {
    // split is a pure function of doc_id — any plan that joins an
    // assignment table back has missed the point of a hash split
    val p = plan("d15_train_split")
    assert(!p.contains("Join"), p)
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("s15 sampled recall: truth side is broadcast O(S*N), never a full cartesian") {
    val p = plan("s15_sampled_recall")
    // the whole point of s15 is scaling past s12: the exact-truth scan
    // must be the s01 shape — sampled side BROADCAST against one pass
    // over the corpus — so a shuffle cartesian is a regression to s04
    assert(!p.contains("CartesianProduct"),
      s"s15 regressed to a full cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"s15's sampled truth side lost its broadcast:\n$p")
  }

  test("s14 embedding survivors: banded pair generation, no cartesian anywhere") {
    val p = plan("s14_embedding_survivors")
    // BNLJ guard too: at sf0.01 a regressed non-equi pair join would fit
    // the broadcast threshold and compile to BNLJ, not CartesianProduct
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"s14 inherited an all-pairs shape:\n$p")
  }

  test("m06 media dedup: the binary payload never enters a shuffle") {
    val p = plan("m06_media_dedup")
    // the row that shuffles is the decode stage's SerializeFromObject
    // output — features only, never the payload bytes
    val serialized = p.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"), p)
  }

  test("m07 perceptual near-dup: id-only band join, payload never shuffles") {
    val p = plan("m07_perceptual_neardup")
    // pairing must ride the (band, nib) equi-join — hash-partitioned on
    // 8-byte fingerprints, never an all-pairs scan of the media rows
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"m07 degenerated to all-pairs:\n$p")
    val serialized = p.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"), p)
  }

  test("m08 audio near-dup: id-only band join, payload never shuffles") {
    val p = plan("m08_audio_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"m08 degenerated to all-pairs:\n$p")
    val serialized = p.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"), p)
  }

  test("m09 video near-dup: per-position band join, payload never shuffles") {
    val p = plan("m09_video_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"m09 degenerated to all-pairs:\n$p")
    val serialized = p.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"), p)
  }

  test("m10 MJPEG census: narrow census rows only — payload never " +
    "outlives the demux scan") {
    val p = plan("m10_mjpeg_census")
    assert(!p.contains("Join"), s"m10 census needs no join:\n$p")
    val serialized = p.linesIterator
      .find(_.contains("SerializeFromObject")).getOrElse("")
    assert(serialized.nonEmpty && !serialized.contains("payload"), p)
  }

  test("m11 MJPEG copies: banded candidates + hash equi-joins for the " +
    "exact verify — no all-pairs, no payload in any shuffle") {
    val p = plan("m11_mjpeg_copies")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"m11 degenerated to all-pairs:\n$p")
    // the verify join moves (id, 16-byte md5) rows — never the payload
    assert(!"Exchange[^\\n]*payload".r.findFirstIn(p).isDefined,
      s"payload entered a shuffle:\n$p")
  }

  test("s13 k-means step: seed codebook broadcasts, assignment never cartesians") {
    val p = plan("s13_kmeans_step")
    // same contract as s06: the 16-row centroid side rides a broadcast
    // (nested-loop against a tiny list is the intended per-row argmax)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s13 lost its centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s17 serving path: centroids/codebook/LUT broadcast, no cartesian") {
    val p = plan("s17_ivf_pq_rerank")
    // the IVF assign rides the s05/s13 broadcast-nested-loop contract;
    // codes and the ADC LUT are broadcast hash joins; nothing cartesians
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s17 lost its broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s16 iterated k-means: every round's centroid side broadcasts, no cartesian") {
    val p = plan("s16_kmeans_iterations")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s16 lost its centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d21 span dedup: winner selection is a combinable aggregate, " +
    "NOT a per-chunk window") {
    val p = plan("d21_span_dedup")
    // the design point: a row_number window partitioned by chunk puts
    // every copy of a mega-repeated boilerplate chunk on one reducer;
    // the min(packed-key) agg collapses copies map-side. The only
    // Window anywhere in this plan would be that regression.
    assert(!p.contains("Window"), s"d21 regressed to a window:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d21 has a non-equi join:\n$p")
  }

  test("t19 LM scoring: model joins are equi-joins, bounded corpus passes") {
    val p = plan("t19_bigram_lm_score")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"t19 has a non-equi join:\n$p")
    // r16: the STANDALONE query runs the model UNPINNED (A/B'd twice:
    // 1.38 s vs 1.56 s pinned — recomputing the vocab-bounded model agg
    // from the raw scan beats the cache write+reads), so the plan shows
    // plain scans, no cache, and at most three corpus passes (scoring
    // trans, model build, prefix rollup). The pipeline callers keep the
    // pin via lmScoresOf's pinModel default — their input is already
    // checkpointed, a different trade.
    assert(!p.contains("InMemoryTableScan"),
      s"t19 standalone regained a pin the A/B rejected:\n$p")
    assert("documents\\.parquet".r.findAllIn(p).size <= 3,
      s"t19 grew a fourth corpus pass:\n$p")
  }

  test("d22 shard plan: one scan, one aggregation — no join, no window") {
    val p = plan("d22_shard_plan")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"shard audit grew a join/window:\n$p")
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("t20 vocabulary richness: two map-side-combine shuffles, no join") {
    val p = plan("t20_vocab_richness")
    assert(!p.contains("Join"), s"t20 grew a join:\n$p")
    // (source, term) tf then the per-source rollup — exactly two
    // aggregation exchanges, both with partial_ combines upstream
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"t20 shuffle count drifted:\n$p")
    assert(p.contains("partial_count"), p)
  }

  test("s18 cluster dedup: quantizer broadcasts, pair join keys on the " +
    "cluster — no corpus cartesian") {
    val p = plan("s18_semantic_cluster_dedup")
    // centroid assignment rides the s06/s13 broadcast contract; the
    // within-cluster pair join is an equi-join on c_id (each cluster an
    // independent partition) — a CartesianProduct would mean the
    // cluster key was lost and the pair search went corpus-wide
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"s18 lost its centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("p01 composed pipeline: banded pair joins only — no cartesian, " +
    "no nested loop anywhere in six composed stages") {
    // the pre-write frame (the full composition; p01 itself returns the
    // post-write receipt scan, whose plan is just the shard read-back)
    val p = graft.queries.TextDedupOps.p01Corpus(spark, sf)
      .queryExecution.executedPlan.toString
    // decontamination rides d03's banded LSH pair chain over the
    // cleaned text: every join in the composition is an equi-join
    // (band key, doc_id, source) — a CartesianProduct or nested loop
    // would mean a stage degenerated to all-pairs
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"p01 degenerated to all-pairs:\n$p")
    // the tiny per-source threshold tables (p10 floor, p90 ceiling)
    // broadcast back — never a shuffle join against two-digit-row sides
    assert(p.contains("BroadcastHashJoin"),
      s"p01 lost its threshold broadcasts:\n$p")
  }

  test("p04 incremental night: id-only banded verdict joins, threshold " +
    "broadcast, no cartesian — |delta| + |index| cost shape") {
    val p = graft.queries.TextDedupOps.p04Corpus(spark, sf,
        production = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"p04 degenerated to all-pairs:\n$p")
    // the per-source p10 threshold table broadcasts back
    assert(p.contains("BroadcastHashJoin"),
      s"p04 lost its threshold broadcast:\n$p")
    // packing stays the bucketed two-pass prefix sum, never a
    // per-source-only ordered window (the p01 discipline)
    assert(!"Window.*partitionBy.*\\[source".r.findFirstIn(p).isDefined,
      s"p04 packing regressed to the per-source ordered window:\n$p")
  }

  test("s19 cluster recall report: truth labeling is hash joins; the " +
    "only non-equi shapes are the two declared audit scans") {
    val p = plan("s19_cluster_recall_report")
    // the s04 truth side (vec_id < vec_id all-pairs audit) and the
    // broadcast centroid argmax are the two DECLARED non-equi joins;
    // labeling truth pairs with cluster ids must stay equi-join
    // (broadcast/shuffled-hash/sort-merge — anything but a loop)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p).nonEmpty,
      s"s19's truth labeling lost its equi joins:\n$p")
    // three declared non-equi nodes: the s04 pair audit plus the
    // broadcast centroid argmax, which the plan string reprints once
    // per labeling side (assigned is referenced for a_id AND b_id)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3,
      s"s19 grew an undeclared non-equi join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t07 distinctive terms: bounded top-k aggregate, no per-language " +
    "window sort") {
    val p = plan("t07_tfidf_top_terms")
    // with a handful of languages a per-lang window would sort a whole
    // language's vocabulary through one task; the TopKByScoreStr
    // aggregate bounds the shuffle at langs × 3
    assert(!p.contains("windowspecdefinition"),
      s"t07 regressed to a window sort:\n$p")
    assert(p.contains("partial_topkbyscorestr"),
      s"t07 lost its bounded map-side top-k:\n$p")
  }

  test("d23 substring dedup: hash joins only, and the interval-merge " +
    "windows partition on doc_id — never corpus-wide") {
    val p = plan("d23_substring_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d23 degenerated to all-pairs:\n$p")
    // every ordered window runs per-doc (bounded by document length);
    // an empty-partition window would serialize the whole anchor set
    assert("windowspecdefinition\\(doc_id#\\d+L, i#".r.findFirstIn(p).isDefined,
      s"d23 lost its per-doc window:\n$p")
    assert(!p.contains("windowspecdefinition(i#"),
      s"d23 grew an unpartitioned window:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"d23 must not globally sort:\n$p")
  }

  test("s20 balanced sample: per-cluster top-k aggregates map-side " +
    "(bounded partials), centroids ride a broadcast") {
    val p = plan("s20_balanced_sample")
    assert(p.contains("partial_topkbyscore"),
      s"s20 lost its bounded map-side top-k:\n$p")
    // the centroid argmax is the declared broadcast nested-loop (s06's
    // shape); nothing else may degenerate to a loop join
    assert(p.contains("BroadcastExchange"), s"s20 lost its broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the top-k must NOT run through a row_number window over members
    assert("windowspecdefinition\\(assigned".r.findFirstIn(p).isEmpty,
      s"s20 regressed to a per-cluster window sort:\n$p")
  }

  test("d24 delta dedup: hash joins only against the read-back index — " +
    "no cartesian, no text column in the serve plan") {
    spark.conf.set("spark.graft.d24.indexDir",
      java.nio.file.Files.createTempDirectory("d24audit").toString)
    try {
      val p = plan("d24_delta_dedup")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"d24 degenerated to all-pairs:\n$p")
      // the index read-back side must be the narrow artifact: content
      // hash + signature, never the base text
      val idxLines = p.linesIterator.filter(_.contains("d24audit")).toSeq
      assert(idxLines.nonEmpty, s"no index scan in plan:\n$p")
      idxLines.foreach(l =>
        assert(!l.contains("text"), s"index scan carries text: $l"))
    } finally spark.conf.unset("spark.graft.d24.indexDir")
  }

  test("s21 filtered kNN: the label predicate reaches the parquet scan " +
    "(pre-filter semantics, not post-rank filtering)") {
    val p = plan("s21_filtered_knn")
    val pushed = p.linesIterator
      .filter(l => l.contains("PushedFilters") && l.contains("label"))
    assert(pushed.nonEmpty, s"label filter not pushed to the scan:\n$p")
    // the rank must come AFTER the filter: no Filter on label above the
    // Window in the final plan (post-filtering would lose recall)
    val aboveWindow = p.substring(0, p.indexOf("Window"))
    assert(!aboveWindow.contains("label IN"),
      s"s21 filters labels after ranking:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m12 media delta: banded fingerprint joins only, and the binary " +
    "payload never enters a shuffle") {
    spark.conf.set("spark.graft.m12.indexDir",
      java.nio.file.Files.createTempDirectory("m12audit").toString)
    try {
      val p = plan("m12_media_delta")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"m12 degenerated to all-pairs:\n$p")
      // fingerprints extract in the decode scan; every Exchange after
      // carries narrow rows only
      p.linesIterator.filter(_.contains("Exchange")).foreach(l =>
        assert(!l.contains("payload"), s"payload entered a shuffle: $l"))
    } finally spark.conf.unset("spark.graft.m12.indexDir")
  }

  test("p02 corpus report: four rollups, hash joins only, no metric " +
    "re-derives the corpus through a cartesian") {
    val p = plan("p02_corpus_report")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"p02 grew an all-pairs:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"p02 must not globally sort:\n$p")
  }

  test("s23 SQ recall: bounds and queries ride broadcasts — the only " +
    "wide joins are the two declared per-row broadcast scans") {
    val p = plan("s23_sq_recall")
    assert(!p.contains("CartesianProduct"), p)
    // the 64-dim bounds row and the NQ query rows each broadcast
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"s23 lost its bounds/query broadcasts:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"s23 must not globally sort:\n$p")
  }

  test("t21 overlap chunks: one scan, zero shuffles — the chunk explode " +
    "never leaves its partition") {
    val p = plan("t21_overlap_chunks")
    // the scan-parallelism floor (Tables.fanOut) may round-robin the
    // DOCUMENT rows before the explode; what must never appear is a
    // key shuffle — that would mean chunk rows crossing partitions
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"), s"t21 grew a key shuffle:\n$p")
    assert(!p.contains("Join"), p)
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("s24 vec delta dedup: the candidate stage is an id-only LSH " +
    "band equi-join — no cartesian, no vectors in the band shuffle") {
    val p = plan("s24_vec_delta_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"s24 degenerated to all-pairs:\n$p")
    // the band join's exchanges carry (id, tab, sig) — the quantized
    // vectors rejoin only for verified candidates, so no exchange on
    // the band key may materialize a qv column
    val bandExchanges = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") &&
        (l.contains("tab#") || l.contains("sig#")))
    bandExchanges.foreach(l =>
      assert(!l.contains("qv#"), s"vectors entered the band shuffle:\n$l"))
  }
}
