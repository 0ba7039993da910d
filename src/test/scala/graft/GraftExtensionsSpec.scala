package graft

import org.apache.spark.sql.SparkSession

import graft.helium.SparkSuite

/** The `spark.sql.extensions` deployment path: a session built with
  * [[GraftExtensions]] sees every graft SQL function WITHOUT any
  * `register()` call — the pure-SQL-session contract. */
class GraftExtensionsSpec extends SparkSuite {

  /** Build a sibling session over the suite's SparkContext with the
    * injector applied, restoring the suite session after. */
  private def withExtSession[A](f: SparkSession => A): A = {
    // materialize the suite's lazy session BEFORE clearing the
    // default-session slot — touching it after would re-create a fresh
    // extensionless session and getOrCreate below would return that
    val master = spark.sparkContext.master
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(master)
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne spark, "extension session must be a fresh session")
      f(s2)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("every FunctionDefs entry resolves and evaluates in a fresh " +
    "extension-built session with no register() call") {
    withExtSession { s2 =>
      // scalar expressions
      assert(s2.sql("SELECT dotq(array(2L, 3L), array(5L, 7L)) v")
        .head().getLong(0) == 31L)
      assert(s2.sql(
        "SELECT size(token_hash_seq('a b c', 0, 1099511627776L)) v")
        .head().getInt(0) == 3)
      assert(s2.sql(
        """SELECT size(shingle_seq(
          |  token_hash_seq('a b c d', 0, 1099511627776L), 2)) v"""
          .stripMargin).head().getInt(0) == 3)
      Seq("simhash_bits", "minhash_sig", "winnow_set").foreach { fn =>
        assert(!s2.sql(
          s"""SELECT $fn(
             |  token_hash_seq('a b c d', 0, 1099511627776L), 4) v"""
            .stripMargin).head().isNullAt(0), fn)
      }
      // lsh_sig consumes the QUANTIZED vector (array<bigint>, the qvec
      // output) — a float array would push a coercion rewrite through
      // every argument
      assert(!s2.sql(
        """SELECT lsh_sig(array(15000L, -25000L, 3000L), 4, 8) v""")
        .head().isNullAt(0))
      // the bloom pair composes end-to-end: build on one column, probe it
      val hit = s2.sql(
        """WITH b AS (SELECT graft_bloom_agg(x, 3L) bf
          |           FROM (VALUES (1L), (2L), (3L)) t(x))
          |SELECT graft_bloom_contains((SELECT bf FROM b), 2L) v"""
          .stripMargin).head().getBoolean(0)
      assert(hit)
    }
  }

  test("extension functions match the register() path bit-for-bit") {
    graft.functions.HashSketch.register(spark)
    val q = "SELECT minhash_sig(token_hash_seq('w1 w2 w3 w4 w5', 0, " +
      "1099511627776L), 12) v"
    val viaRegister = spark.sql(q).head().getSeq[Long](0)
    val viaExtension = withExtSession(_.sql(q).head().getSeq[Long](0))
    assert(viaRegister == viaExtension)
  }
}
