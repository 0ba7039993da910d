package graft.helium

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import Model._
import graft.helium.source.BlockSourceProvider

/** The follower — SURVEY §3.1's main pipeline, assembled Spark-first.
  *
  * Reference flow: every 10 s poll height, drain pending blocks one at a
  * time, each in its own DB transaction (src/main.rs:55-64,
  * src/follower.rs:69-112). Here: a Structured Streaming query over
  * [[source.BlockSourceProvider]] with `Trigger.ProcessingTime("10 seconds")`;
  * each micro-batch covers the whole pending height range (drain semantics)
  * and commits through [[ExactlyOnceSink]] (idempotent batch partition +
  * cursor advance = the per-block transaction, K4).
  */
object Follower {

  /** Resolve the start state: resume from the cursor, else backfill-scan
    * the node for its first block, else start at the tip
    * (src/follower.rs:27-41). */
  def bootstrap(spark: SparkSession, node: NodeClient, root: String,
      backfill: Boolean): IngestState = {
    val store = new StateStore(spark, root)
    store.load().getOrElse {
      val first = if (backfill) Backfill.firstBlock(node) else node.height()
      // follower starts at height = first-1 so the first block processed
      // is `first` (src/follower.rs:37)
      val st = IngestState(math.max(first - 1, 0), first)
      store.advance(st)
      st
    }
  }

  /** Parse raw (height, json) source rows into blockSchema rows. */
  def parseBlocks(raw: DataFrame): DataFrame =
    raw.select(from_json(col("json"), blockSchema).as("b")).select("b.*")

  /** Collect the distinct rewards_v2 stub hashes of a batch and fetch their
    * payloads through the node — the S3 enrichment executed once per batch
    * instead of once per row (the reference's N+1,
    * src/block_processor.rs:58). Distributed: fetches happen per-partition
    * on executors. */
  def fetchPayloads(spark: SparkSession, node: NodeClient,
      blocks: DataFrame, mode: EtlMode): DataFrame = {
    import org.apache.spark.sql.Row
    val wanted = Transforms.explodeStubs(blocks)
    val hashes = (mode match {
      case EtlMode.Full => wanted
      case _ => Transforms.dispatchRewards(wanted)
    }).select("hash").distinct()
    val fetched = hashes.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val h = r.getString(0)
        node.getTxnJson(h).map(Row(h, _))
      }
    }
    val raw = spark.createDataFrame(fetched,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("hash",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("json",
          org.apache.spark.sql.types.StringType))))
    raw.select(from_json(col("json"), txnSchema).as("t")).select("t.*")
  }

  /** Start the streaming follower. Caller stops the query or lets the
    * trigger run forever (daemon parity). `nodeAddr` takes any
    * [[NodeClient.forAddr]] scheme: a fixture dir, `fixture://dir`, or a
    * JSON-RPC `http(s)://` endpoint. */
  def start(spark: SparkSession, nodeAddr: String, root: String,
      mode: EtlMode, lists: Allowlists = Allowlists(Set.empty, Set.empty),
      backfill: Boolean = false,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      checkpoint: Option[String] = None): StreamingQuery = {

    val node = NodeClient.forAddr(nodeAddr)
    val st = bootstrap(spark, node, root, backfill)
    val sink = new ExactlyOnceSink(spark, root)

    spark.readStream
      .format(classOf[BlockSourceProvider].getName)
      .option("node", nodeAddr)
      .option("startHeight", st.height.toString)
      .load()
      .writeStream
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$root/_checkpoint"))
      .trigger(trigger)
      .foreachBatch { (raw: DataFrame, _: Long) =>
        if (!raw.isEmpty) {
          val blocks = parseBlocks(raw).cache()
          try {
            val payloads = fetchPayloads(spark, node, blocks, mode)
            val out = Pipeline.run(mode, blocks, payloads, lists)
            // partition key = batch content (max height), not the epoch id:
            // stays idempotent across checkpoint resets (ExactlyOnceSink)
            val maxH = blocks.agg(max(col("height"))).head().getLong(0)
            sink.commit(out, maxH, st.first_block)
          } finally blocks.unpersist()
        }
      }
      .start()
  }
}
