package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** Tokenize-at-ingest: apply a LEARNED BPE merge table to documents as
  * they stream in — the serving half of tokenizer training (t15 /
  * [[graft.operators.BpeTrainer]] learn the table; this ships it). The
  * merge table is exactly what ships to workers in a production
  * tokenizer: vocabulary-bounded, broadcast once, applied per row with
  * no state and no shuffle, so the op composes with any streaming
  * source as a pure map and scales with the input, not the vocabulary.
  *
  * Word extraction ([a-z]+ over lowercased text) and the greedy-leftmost
  * sequential apply are the SAME formulas as the batch chain
  * ([[graft.queries.TextDedupOps]]'s bpeWords regex and bpeChain fold),
  * so stream token accounting equals batch t16's exactly
  * (spec-asserted: Σ n_tokens over the stream = t16's tokens_after on
  * the same corpus and merge table). Distinct words repeat heavily in
  * any real corpus, so the apply is memoized per partition — the
  * tokenizer cache every serving implementation keeps.
  */
object StreamTokenizer {

  case class Doc(doc_id: Long, text: String)

  /** Load a FROZEN merge table from a t23-style tokenizer artifact
    * (parquet rows `(merge_round, lhs, rhs, pair_count)`) — the glue
    * between the batch-trained artifact and this serving path: a
    * streaming fleet starts from the files the training job shipped,
    * never from a retrain. Rounds-bounded, so the collect is a few KB. */
  def loadMerges(spark: SparkSession, dir: String)
      : IndexedSeq[(String, String)] =
    loadMergesWithGen(spark, dir)._2

  /** [[loadMerges]] plus the PROVENANCE of what was loaded: the
    * generation number the table came from (−1 for a flat pre-store
    * artifact). A fleet resolves the live generation ONCE at startup
    * and stamps it into every row it accounts
    * ([[tokenizeWithGen]]) — so when a t23 retrain lands mid-stream,
    * the in-flight stream's output still RECORDS which table produced
    * it, instead of silently continuing on the old table with no
    * trace (the audit gap this closes). */
  def loadMergesWithGen(spark: SparkSession, dir: String)
      : (Long, IndexedSeq[(String, String)]) = {
    import spark.implicits._
    // generation-aware: a t23 artifact is a generation store (each
    // retrain = a new atomically-committed total), while flat parquet
    // dirs (hand-shipped artifacts) stay readable as before
    val gen = graft.operators.IndexGenerations.currentGen(spark, dir)
    val src = gen match {
      case Some(_) => graft.operators.IndexGenerations.readCurrent(spark, dir)
      case None    => spark.read.parquet(dir)
    }
    (gen.getOrElse(-1L),
      src.orderBy("merge_round")
        .select("lhs", "rhs")
        .as[(String, String)].collect().toIndexedSeq)
  }

  case class Tokenized(doc_id: Long, n_words: Long, n_chars: Long,
      n_tokens: Long)

  /** [[Tokenized]] with the tokenizer-generation stamp: every row names
    * the artifact generation whose table produced its counts. */
  case class TokenizedG(doc_id: Long, n_words: Long, n_chars: Long,
      n_tokens: Long, tok_gen: Long)

  /** One word through the learned merges, sequentially in learned order
    * with the chain's greedy-leftmost scan per rule (append, or replace
    * the just-appended lhs when the pair matches — a merged symbol
    * lhs||rhs can never equal lhs, so one pass per rule suffices). This
    * IS the definition the distributed chain and the trainer both
    * implement, so all three produce identical sequences. */
  private[graft] def tokenizeWord(word: String,
      merges: IndexedSeq[(String, String)]): Array[String] = {
    var seq: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (lhs, rhs) =>
      if (seq.length >= 2 && seq.contains(lhs)) {
        val out = collection.mutable.ArrayBuffer.empty[String]
        seq.foreach { x =>
          if (out.nonEmpty && out.last == lhs && x == rhs)
            out(out.length - 1) = lhs + rhs
          else out += x
        }
        seq = out.toArray
      }
    }
    seq
  }

  /** Per-doc token accounting under the learned table: word count,
    * character-token baseline, and post-merge token count — the stream
    * analogue of t16's corpus rollup, per document at ingest. */
  def tokenize(docs: Dataset[Doc],
      merges: Seq[(String, String)]): Dataset[Tokenized] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    docs.mapPartitions { it =>
      // per-partition tokenizer cache: distinct words ≪ occurrences
      val cache = collection.mutable.HashMap.empty[String, Int]
      val re = java.util.regex.Pattern.compile("[a-z]+")
      it.map { d =>
        val m = re.matcher(d.text.toLowerCase(java.util.Locale.ROOT))
        var nW = 0L; var nCh = 0L; var nTok = 0L
        while (m.find()) {
          val w = m.group()
          nW += 1
          nCh += w.length
          nTok += cache.getOrElseUpdate(w, tokenizeWord(w, bc.value).length)
        }
        Tokenized(d.doc_id, nW, nCh, nTok)
      }
    }
  }

  /** [[tokenize]] with the generation stamp carried into every output
    * row. The table (and its stamp) are FROZEN at query build: a t23
    * retrain landing mid-stream neither changes in-flight accounting
    * (the broadcast table is immutable) nor goes unrecorded (every row
    * names the generation that produced it); a restarted or new stream
    * re-resolves via [[loadMergesWithGen]] and stamps the new number —
    * StreamTokenizerSpec pins all three properties. */
  def tokenizeWithGen(docs: Dataset[Doc],
      merges: Seq[(String, String)], gen: Long): Dataset[TokenizedG] = {
    val spark = docs.sparkSession
    import spark.implicits._
    tokenize(docs, merges).map(t =>
      TokenizedG(t.doc_id, t.n_words, t.n_chars, t.n_tokens, gen))
  }
}
