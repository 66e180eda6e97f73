package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface bootstrap: register every graft table as a temp view
  * (and the native functions via [[GraftExtensions]] if the session
  * was built with them), so the full engine is usable from plain
  * `spark.sql`:
  *
  * {{{
  * GraftCatalog.registerAll(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT simhash64(tokenize_words(text)) FROM documents")
  * }}}
  */
object GraftCatalog {
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.loaders.foreach { case (name, loader) =>
      loader(spark, dir).createOrReplaceTempView(name)
    }

  /** Additionally expose every BATCH replay query as a `graft_<name>`
    * temp view, so the whole operator surface composes from plain SQL
    * (`SELECT * FROM graft_kv_snapshot WHERE namespace = 'click'`).
    * Streaming queries are excluded: building their frame runs the
    * micro-batch replay eagerly. Views are lazy logical plans except
    * `graft_dedup_clusters`/`graft_corpus_keepers`, whose iterative
    * label propagation materializes while registering.
    */
  def registerQueryViews(spark: SparkSession, dir: String): Unit = {
    // exclusion derived from the streaming registry itself, not a
    // naming convention — a mis-classified query would either run its
    // whole micro-batch replay eagerly here or silently vanish
    val streamingNames = graft.streaming.Streaming.all.map(_.name).toSet
    SparkEntry.queries
      .filter { case (name, _) => !streamingNames.contains(name) }
      .foreach { case (name, fn) =>
        fn(spark, dir).createOrReplaceTempView(s"graft_$name")
      }
  }
}
