package graft.operators

import scala.collection.mutable

/** Driver-local BPE merge learning over an AGGREGATED (word, count)
  * vocabulary — the piece that makes tokenizer training feasible at real
  * vocabulary scale (~30k–100k merges).
  *
  * Division of labour at 100 TB (the union-find `LocalEdgeCutoff`
  * pattern, [[ConnectedComponents]]): the corpus-sized work — the
  * (word, cnt) vocabulary aggregation and the final merge application —
  * stays distributed; the merge LOOP runs here over the aggregated
  * vocabulary table, which is bounded (≪ corpus: distinct words, not
  * occurrences — a 2M-row vocab collects to ~40 MB, the same budget
  * reasoning as the CC edge cutoff). One Spark stage per merge round
  * (the k-chained-jobs shape) cannot run 30k rounds; this loop runs them
  * in milliseconds each because every round touches only the words that
  * actually CONTAIN the merged pair.
  *
  * Algorithm (Sennrich et al. 2016, the incremental variant every real
  * tokenizer trainer uses): maintain
  *   - per-word symbol sequences,
  *   - adjacent-pair counts weighted by word frequency,
  *   - an inverted index pair → set of words containing it,
  *   - an ordered set over (count desc, lhs asc, rhs asc) for O(log P)
  *     argmax — the same deterministic tie-break as the distributed
  *     chain ([[graft.queries.TextDedupOps.bpeMerges]]) and the DuckDB
  *     oracle, so all three engines learn identical merge tables
  *     (spec-asserted, BpeTrainerSpec).
  * Per round: pop the best pair, greedily merge it leftmost in exactly
  * the words the inverted index names, and apply the count deltas of
  * those words only. Round cost is proportional to the AFFECTED words,
  * not the vocabulary — the property that makes ≥30k rounds feasible.
  */
object BpeTrainer {

  final case class Merge(round: Long, lhs: String, rhs: String,
      pairCount: Long)

  /** @param vocab (word, occurrence count) — aggregated, each word once
    * @param rounds maximum merges to learn; stops early when no pair is
    *               left (fully merged vocabulary)
    * @return (learned merges in order, final symbol sequence per input
    *         word — parallel to `vocab`) */
  def train(vocab: IndexedSeq[(String, Long)], rounds: Int)
      : (Vector[Merge], Array[Array[String]]) = {
    val n = vocab.length
    val seqs: Array[mutable.ArrayBuffer[String]] = Array.tabulate(n) { i =>
      mutable.ArrayBuffer(vocab(i)._1.map(_.toString): _*)
    }
    val cnts: Array[Long] = Array.tabulate(n)(vocab(_)._2)

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // ascending (-count, lhs, rhs) = the chain's (count desc, lhs, rhs)
    val ordered = mutable.TreeSet.empty[(Long, String, String)]

    def pairsOf(seq: collection.Seq[String]): Iterator[(String, String)] =
      if (seq.length < 2) Iterator.empty
      else seq.iterator.zip(seq.iterator.drop(1))

    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) ordered.remove((-old, p._1, p._2))
      val nu = old + delta
      if (nu != 0L) {
        counts(p) = nu
        ordered.add((-nu, p._1, p._2))
      } else counts.remove(p)
    }

    var i = 0
    while (i < n) {
      val c = cnts(i)
      pairsOf(seqs(i)).foreach { p =>
        bump(p, c)
        occurs.getOrElseUpdate(p, mutable.HashSet.empty) += i
      }
      i += 1
    }

    val merges = Vector.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      if (ordered.isEmpty || ordered.head._1 >= 0) done = true
      else {
        val (negC, lhs, rhs) = ordered.head
        merges += Merge(r.toLong, lhs, rhs, -negC)
        val merged = lhs + rhs
        // snapshot: the loop below mutates the occurrence sets
        val affected = occurs.getOrElse((lhs, rhs),
          mutable.HashSet.empty[Int]).toArray
        affected.foreach { wid =>
          val c = cnts(wid)
          val old = seqs(wid)
          val oldPairs = pairsOf(old).toVector
          // greedy leftmost scan — identical semantics to the chain's
          // per-row fold: append, or replace the just-appended lhs when
          // the pair matches (a merged symbol lhs||rhs can never equal
          // lhs, so one pass suffices)
          val nw = mutable.ArrayBuffer.empty[String]
          old.foreach { x =>
            if (nw.nonEmpty && nw.last == lhs && x == rhs)
              nw(nw.length - 1) = merged
            else nw += x
          }
          seqs(wid) = nw
          val newPairs = pairsOf(nw).toVector
          oldPairs.foreach(bump(_, -c))
          newPairs.foreach(bump(_, c))
          val newKeys = newPairs.toSet
          newKeys.foreach(q =>
            occurs.getOrElseUpdate(q, mutable.HashSet.empty) += wid)
          (oldPairs.toSet -- newKeys).foreach { q =>
            occurs.get(q).foreach { s =>
              s -= wid
              if (s.isEmpty) occurs.remove(q)
            }
          }
        }
        r += 1
      }
    }
    (merges.result(), seqs.map(_.toArray))
  }
}
