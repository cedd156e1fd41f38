package graft.plans

import graft.functions.{CosineSim, HilbertIndex, JaccardSim, LevenshteinK, Md5Hash60, MinHash, SimHash}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extension: registers graft's native functions.
  * Use via `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or post-hoc with [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(MinHash.functionDescriptor)
    ext.injectFunction(CosineSim.functionDescriptor)
    ext.injectFunction(JaccardSim.functionDescriptor)
    ext.injectFunction(SimHash.functionDescriptor)
    ext.injectFunction(HilbertIndex.functionDescriptor)
    ext.injectFunction(LevenshteinK.functionDescriptor)
    ext.injectFunction(Md5Hash60.functionDescriptor)
    ext.injectOptimizerRule(s => RangeJoinBucketRewrite(s))
  }
}

object GraftExtensions {
  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    Seq(MinHash.functionDescriptor, CosineSim.functionDescriptor,
        JaccardSim.functionDescriptor, SimHash.functionDescriptor,
        HilbertIndex.functionDescriptor, LevenshteinK.functionDescriptor,
        Md5Hash60.functionDescriptor).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
