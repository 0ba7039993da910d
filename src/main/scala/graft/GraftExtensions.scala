package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The `spark.sql.extensions` entry point: register every graft SQL
  * function at SESSION BUILD TIME, before any user code runs —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions())`. This is the deployment face of the extension
  * surface: the per-object `register(spark)` calls the query modules
  * make are lazy conveniences for library callers; a pure-SQL session
  * (thrift server, notebook gateway, `spark-sql`) never calls them, and
  * this injector is how such sessions see `dotq`, `minhash_sig`,
  * `graft_bloom_agg`, … from their first statement. Both paths read the
  * same [[graft.functions.FunctionDefs]] list, so they cannot diverge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.FunctionDefs.all.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
