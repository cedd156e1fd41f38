package graft.plans

import graft.functions.MinHash
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension: registers graft's native functions.
  * Use via `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or post-hoc with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(MinHash.functionDescriptor)
  }
}

object GraftExtensions {
  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = MinHash.functionDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
