package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list —
  * the clustering step that turns near-duplicate PAIRS (MinHash/LSH or
  * exact-Jaccard output) into dedup GROUPS: every document in a component
  * is a near-dup of the others through some chain, and `min(id)` per
  * component is the canonical survivor.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * adopts the minimum label among itself and its neighbours; labels are
  * monotonically non-increasing and bounded below, so the global label sum
  * is a convergence certificate (fixpoint ⇔ sum unchanged). Rounds needed
  * = component diameter — near-dup clusters are shallow (dups of a common
  * ancestor), so this converges in a handful of rounds. For adversarial
  * long-chain graphs the round body below is the same join shape used by
  * the large-star/small-star algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), which converges in
  * O(log n) rounds; swap the neighbour-min for star-conditioned updates if
  * chains ever dominate.
  *
  * Scale notes (100 TB): each round is ONE shuffle — a join on node id
  * followed by a partial-aggregated groupBy(min). The edge list is cached
  * across rounds; `localCheckpoint` truncates lineage so the plan does not
  * grow with iteration count (the classic iterative-DataFrame trap). The
  * driver only ever sees one aggregated Long per round, never row data.
  *
  * Size-based algorithm selection: below [[LocalEdgeCutoff]] edges the
  * whole graph is collected and solved with path-compressed union-find on
  * the driver — the same size-cutoff reasoning Spark applies when choosing
  * broadcast over shuffle joins. Near-dup pair graphs are the common case
  * and are tiny relative to the corpus; the distributed rounds exist for
  * the genuinely large graphs where collecting would not fit.
  */
object ConnectedComponents {

  /** Edge-count cutoff below which the component computation runs as
    * driver-side union-find instead of iterative propagation — the same
    * size-based algorithm selection Spark applies to joins (broadcast vs
    * shuffle). Near-dup pair graphs are tiny relative to the corpus
    * (pairs ≪ docs after LSH), so the common case pays one collect of the
    * deduplicated edge list instead of diameter+1 distributed rounds; a
    * pair list above the cutoff takes the distributed path unchanged.
    * 2M edges ≈ 32 MB collected — well under driver budgets that already
    * accept 10 MB+ broadcast tables. */
  val LocalEdgeCutoff = 2000000L

  /** @param edges two-column DataFrame of undirected edges (any orientation,
    *              duplicates fine)
    * @return (node, comp) — one row per node that appears in an edge;
    *         comp = min node id reachable, i.e. the component label */
  def run(edges: DataFrame, src: String = "src", dst: String = "dst",
      maxRounds: Int = 50, localCutoff: Long = LocalEdgeCutoff): DataFrame = {
    val e = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (sym.count() <= localCutoff) {
      val local = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
      sym.unpersist()
      val result = localUnionFind(local)
      val spark = edges.sparkSession
      import spark.implicits._
      return result.toSeq.toDF("node", "comp")
    }

    // seed with min(self, neighbours) — same cost as a distinct over the
    // endpoints, but already one propagation hop ahead
    var labels = sym.groupBy(col("a"))
      .agg(min(col("b")).as("nb"))
      .select(col("a").as("node"), least(col("a"), col("nb")).as("comp"))
      .localCheckpoint(true)
    // decimal sum: overflow-proof certificate at any node-id magnitude.
    // coalesce to 0: sum over an empty frame is NULL, and a null certificate
    // NPEs the convergence compare (zero-edge inputs are legal — any corpus
    // with no near-dup pairs).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head()
        .getDecimal(0)

    var prev = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighbourMin = sym.join(labels, sym("a") === labels("node"))
        .select(sym("b").as("node"), col("comp"))
      val next = labels.unionByName(neighbourMin)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val cur = labelSum(next)
      labels.unpersist()
      labels = next
      round += 1
      converged = cur.compareTo(prev) == 0
      prev = cur
    }
    sym.unpersist()
    labels
  }

  /** Path-compressed union-find over a collected edge list; always attaches
    * the larger root under the smaller, so every root is the min id of its
    * component — identical labels to the distributed propagation (the
    * property test runs both paths against each other). */
  private def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    // iterative find: recursion depth equals chain length before
    // compression, which can approach the edge cutoff on adversarial
    // insert orders — deep enough to overflow the stack
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.iterator
      .map((x: Long) => x -> find(x)).toMap
  }
}
