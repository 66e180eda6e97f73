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
}
