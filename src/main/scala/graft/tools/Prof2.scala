package graft.tools

import graft.ops.{Dedup, Shingles, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the minhash pipeline (not committed). */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    df.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val bands = 16; val rowsPerBand = 4
    val sigs = df.select(col("doc_id").as("id"),
        transform(Shingles.shingleStrings(TextAnalysis.tokens(col("text")), 1), Shingles.md5Hash60(_)).as("h"))
      .repartition(col("id"))
      .select(col("id"), Dedup.minhashSignatureFromHashes(col("h"), 64).as("sig"))
    val banded = sigs.select(col("id"),
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*).as("bk"))
    val exploded = banded.select(col("id"), col("bk"),
      posexplode(col("bk")).as(Seq("band", "bkey")))

    // (a) join-based candidates with first-band filter
    val l = exploded.select(col("band"), col("bkey"), col("id").as("id_a"), col("bk").as("bk_a"))
    val r = exploded.select(col("band"), col("bkey"), col("id").as("id_b"), col("bk").as("bk_b"))
    val candJoin = l.join(r, Seq("band", "bkey"))
      .where(col("id_a") < col("id_b") &&
        !graft.functions.BandPrefixMatch.matchesBefore(col("bk_a"), col("bk_b"), col("band")))
      .select("id_a", "id_b")
    val nJ = time("cand_join")(candJoin.queryExecution.toRdd.count())
    println(s"join candidates: $nJ")

    // (b) bucket-collect + double posexplode
    val buckets = exploded.groupBy("band", "bkey")
      .agg(collect_list(struct(col("id"), col("bk"))).as("ms"))
      .where(size(col("ms")) > 1)
    val candGen = buckets
      .select(col("band"), col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("band"), col("a"), posexplode(col("ms")).as(Seq("j", "b")), col("i"))
      .where(col("j") > col("i") &&
        !graft.functions.BandPrefixMatch.matchesBefore(col("a.bk"), col("b.bk"), col("band")))
      .select(least(col("a.id"), col("b.id")).as("id_a"), greatest(col("a.id"), col("b.id")).as("id_b"))
    val nG = time("cand_gen")(candGen.queryExecution.toRdd.count())
    println(s"gen candidates: $nG")

    // verify stage alone (cand cached)
    val cached = candGen.cache()
    cached.count()
    val toks = df.select(col("doc_id").as("id"),
      array_sort(array_distinct(transform(TextAnalysis.tokens(col("text")), Shingles.md5Hash60(_)))).as("toks"))
    val v = cached
      .join(broadcast(toks.select(col("id").as("id_a"), col("toks").as("toks_a"))), Seq("id_a"))
      .join(broadcast(toks.select(col("id").as("id_b"), col("toks").as("toks_b"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardSim.jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= 0.8)
    val vN = time("verify_only")(v.queryExecution.toRdd.count())
    println(s"verified: $vN")
    cached.unpersist()

    spark.stop()
  }
}
