package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` injector: install with
  * `--conf spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * Injects the native SQL functions ([[graft.functions.Registry]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Registry.descriptions.foreach(ext.injectFunction)
}
