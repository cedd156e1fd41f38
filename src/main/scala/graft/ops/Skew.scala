package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Skew mitigation helpers. AQE's skew-join handling covers sort-merge
  * joins; these cover the aggregation side and broadcast-averse cases.
  */
object Skew {

  /** Two-phase (salted) aggregation for algebraic aggregates over skewed
    * keys: phase 1 aggregates on (key, salt) — hot keys split across `salt`
    * reducers — phase 2 merges the partials on key alone. Pass the SAME
    * algebraic aggregate both times (sum/count-as-sum/min/max).
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                      phase1: Seq[(String, Column)],
                      phase2: String => Column): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val p1 = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(phase1.head._2.as(phase1.head._1),
        phase1.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(keyCols.map(col): _*)
      .agg(phase2(phase1.head._1).as(phase1.head._1),
        phase1.tail.map { case (n, _) => phase2(n).as(n) }: _*)
  }

  /** Join-key skew DIAGNOSTIC — the measurement that decides whether the
    * mitigations above (or AQE skew splitting) are needed: the `topK`
    * hottest keys with their row counts and integer parts-per-million share
    * of the table. One count aggregate (map-side combined) + a
    * TakeOrderedAndProject over the key-counts frame; ties break on the
    * key, and share_ppm = cnt·10^6 div total is pure integer arithmetic —
    * deterministic and engine-exact.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val total = df.count()
    df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
      .withColumn("share_ppm", expr(s"(cnt * 1000000L) div ${total}L"))
  }

  /** Salted broadcast-free join for a skewed left key against a small-ish
    * right side: right rows are replicated `saltBuckets` times, left rows get
    * a random-but-deterministic salt, and the join key becomes (key, salt) —
    * splitting each hot key across `saltBuckets` reducers.
    */
  /** Pre-flight EXACT inner-equi-join output cardinality: Σ over shared
    * keys of cnt_left(k)·cnt_right(k), plus the planner's skew signals —
    * shared key count and the hottest single key's contribution. Run this
    * BEFORE a join that might explode: it costs two skinny per-key count
    * aggregates (map-side combined; payloads never move) and a count-frame
    * join, and its output decides broadcast vs salt ([[saltedJoin]]) vs
    * re-blocking. All products/sums in DECIMAL(38,0) — a hot key squared
    * overflows BIGINT long before it overflows the join.
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String]): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as(as))
    val prod = col("cl").cast(DecimalType(19, 0)) *
      col("cr").cast(DecimalType(19, 0))
    counts(left, "cl").join(counts(right, "cr"), keyCols)
      .agg(
        sum(prod).cast(DecimalType(38, 0)).as("join_rows"),
        count(lit(1)).cast(LongType).as("shared_keys"),
        max(prod).cast(DecimalType(38, 0)).as("max_key_rows"))
  }

  def saltedJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    saltedLeft.join(saltedRight, keyCols :+ "__salt").drop("__salt")
  }
}
