package graft

import graft.ops.{Constraints, Correlation, Joins}
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "a", "x", 10.0),
    (2L, "a", "x", 20.0),
    (3L, "b", "y", 30.0),
    (4L, "b", "z", 40.0), // violates b -> (y)
    (5L, "c", "y", 50.0)
  ).toDF("id", "k", "v", "amt")

  test("fdCheck counts violating groups and rows; key FDs hold") {
    val out = Constraints.fdCheck(df, Seq(
      Seq("id") -> Seq("k"),     // key FD: holds
      Seq("k") -> Seq("v"),      // violated by k=b (2 rows)
      Seq("k") -> Seq("v", "amt") // violated by a (amt differs) and b
    )).orderBy("fd").collect()
    val byFd = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byFd("id->k") == ((5L, 0L, 0L)))
    assert(byFd("k->v") == ((3L, 1L, 2L)))
    assert(byFd("k->v,amt") == ((3L, 2L, 4L)))
  }

  test("fdCheck NULL semantics: NULL is a value — mixed NULL/value groups violate") {
    val n = Seq(
      (1L, "a", Option("x")),
      (2L, "a", None),          // {x, NULL}: violates a -> v
      (3L, "b", None),
      (4L, "b", None),          // all-NULL group: consistent
      (5L, "c", Option("y"))
    ).toDF("id", "k", "v")
    val out = Constraints.fdCheck(n, Seq(Seq("k") -> Seq("v")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((3L, 1L, 2L))) // only k=a violates, with its 2 rows
  }

  test("fdStrength: g3 = min delete fraction; exact FD scores 0; NULL is a value") {
    // k=a: 2 rows agree on x (max 2); k=b: y and z split 1/1 (max 1); k=c: 1
    val g = Constraints.fdStrength(df, Seq(
      Seq("id") -> Seq("k"),   // key FD: kept = n -> g3 = 0
      Seq("k") -> Seq("v")))   // kept = 2 + 1 + 1 = 4 of 5 -> g3 = 0.2
      .orderBy("fd").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getDouble(5))).toMap
    assert(g("id->k") == ((5L, 0.0)))
    assert(g("k->v") == ((4L, 0.2)))
    // NULL rhs values count as a value (the fdCheck convention)
    val n = Seq((1L, "a", Option("x")), (2L, "a", None), (3L, "a", None)).toDF("id", "k", "v")
    val gn = Constraints.fdStrength(n, Seq(Seq("k") -> Seq("v"))).collect()(0)
    assert(gn.getLong(3) == 2L && gn.getDouble(5) == 1.0 / 3.0)
  }

  test("isKey") {
    assert(Constraints.isKey(df, Seq("id")))
    assert(!Constraints.isKey(df, Seq("k")))
    assert(Constraints.isKey(df, Seq("k", "amt")))
  }

  test("monotonicityViolations counts wrong-direction steps per group") {
    val ev = Seq(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 1.5), // one regression
      (2L, 1L, 5.0), (2L, 2L, 5.0),                 // equal is NOT a regression (strict)
      (3L, 1L, 9.0)
    ).toDF("u", "seq", "v")
    val out = Constraints.monotonicityViolations(ev, Seq("u"), "seq", "v")
      .orderBy("u").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 1L), (2L, 2L, 0L), (3L, 1L, 0L)))
    // descending audit flips the direction
    val desc = Constraints.monotonicityViolations(ev, Seq("u"), "seq", "v", ascending = false)
      .orderBy("u").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(desc.toSeq == Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("foreignKeyAudit: orphans, NULL-fk exclusion, multi-column keys") {
    import spark.implicits._
    val parent = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("pk", "pt")
    val child = Seq(
      (10L, Some(1L)), (11L, Some(2L)), (12L, Some(2L)), // matched
      (13L, Some(9L)), (14L, Some(9L)), (15L, Some(8L)), // orphans: keys {9, 8}
      (16L, None), (17L, None)                           // NULL fk: excluded
    ).toDF("id", "fk")
    val r = Constraints.foreignKeyAudit(child, Seq("fk"), parent, Seq("pk")).collect()(0)
    assert(r.getString(0) == "fk->pk")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((8L, 2L, 3L, 2L)))

    // multi-column fk: (a, b) must appear as a (pk, pt) pair
    val child2 = Seq((1L, 1L, "x"), (2L, 1L, "y"), (3L, 3L, "y"), (4L, 7L, "x"))
      .toDF("id", "a", "b")
    val r2 = Constraints.foreignKeyAudit(child2, Seq("a", "b"), parent, Seq("pk", "pt")).collect()(0)
    // (1,x) ok; (1,y) orphan (pair not present); (3,y) ok; (7,x) orphan
    assert((r2.getLong(1), r2.getLong(3), r2.getLong(4)) == ((4L, 2L, 2L)))

    // intact FK audits clean
    val clean = Constraints.foreignKeyAudit(
      Seq((1L, 1L), (2L, 3L)).toDF("id", "fk"), Seq("fk"), parent, Seq("pk")).collect()(0)
    assert(clean.getLong(3) == 0L && clean.getLong(4) == 0L)
  }

  test("benfordAudit: digit counts, exclusions, chi2 = left-fold of terms") {
    // digits (scale 0): 1,1,1,2,9 — zeros and NULLs excluded, negative uses |v|
    val b = Seq(Option(12L), Option(145L), Option(-199L), Option(23L), Option(9L),
      Option(0L), None).toDF("amt").select(col("amt").cast("double").as("amt"))
    val rows = Constraints.benfordAudit(b, Seq("amt" -> 0))
      .orderBy("digit").collect()
    assert(rows.length == 9)
    val obs = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(obs(1) == 3L && obs(2) == 1L && obs(9) == 1L && obs(3) == 0L)
    assert(rows.forall(_.getLong(3) == 5L)) // n excludes the 0 and the NULL
    // share is observed/n; chi2 equals the left-fold of the 9 terms
    val d1 = rows.find(_.getInt(1) == 1).get
    assert(d1.getDouble(4) == 3.0 / 5.0)
    val terms = rows.map(_.getDouble(6))
    assert(rows.head.getDouble(7) == terms.reduceLeft(_ + _))
    // every row of a column carries the same chi2
    assert(rows.map(_.getDouble(7)).distinct.length == 1)
  }

  test("benfordAudit: fixed-point scale routes fractional values; multi-column one pass") {
    // 0.12 at scale 2 -> 12 -> digit 1; at the same pass a second column
    val b = Seq((0.12, 912.0), (0.034, 8.5)).toDF("x", "y")
    val rows = Constraints.benfordAudit(b, Seq("x" -> 2, "y" -> 2))
      .where(col("observed") > 0).orderBy("col_name", "digit").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("x", 1, 1L), ("x", 3, 1L), ("y", 8, 1L), ("y", 9, 1L)))
  }

  test("coMissingness: pair null counts, jaccard and lift") {
    val m = Seq(
      (Option("a"), Option("x"), Option(1.0)),
      (None, None, Option(2.0)),        // a,b co-missing
      (None, None, None),               // all three missing
      (Option("d"), None, Option(4.0)), // b alone
      (Option("e"), Option("y"), Option(5.0))
    ).toDF("a", "b", "c")
    val rows = Constraints.coMissingness(m, Seq("a", "b", "c"))
      .orderBy("col_a", "col_b").collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byPair(("a", "b")) == ((2L, 3L, 2L)))
    assert(byPair(("a", "c")) == ((2L, 1L, 1L)))
    assert(byPair(("b", "c")) == ((3L, 1L, 1L)))
    val ab = rows.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getLong(2) == 5L)
    assert(ab.getDouble(6) == 2.0 / 3.0)           // jaccard: 2 both / 3 union
    assert(ab.getDouble(7) == (2.0 * 5.0) / (2.0 * 3.0)) // lift > 1: correlated
    // no-null column pair: jaccard/lift are NULL (0-denominator guards)
    val none = Constraints.coMissingness(
      Seq((1, 2)).toDF("x", "y"), Seq("x", "y")).collect()(0)
    assert(none.isNullAt(6) && none.isNullAt(7))
  }

  test("typeDrift: persisted audit flags content-type changes and new columns") {
    val dir = java.nio.file.Files.createTempDirectory("typedrift").toString
    try {
      val ref = Seq(("1", "2024-01-02"), ("22", "2024-02-03"))
        .toDF("amount", "day")
      Constraints.saveTypeAudit(ref, Seq("amount", "day"), s"$dir/types")
      // upstream starts sending floats into the int column; day unchanged;
      // a new column appears
      val cur = Seq(("1.5", "2024-03-04", "x"), ("2.25", "2024-04-05", "y"))
        .toDF("amount", "day", "note")
      val got = Constraints.typeDrift(spark, cur, Seq("amount", "day", "note"), s"$dir/types")
        .collect().map(r => r.getString(0) ->
          ((Option(r.getString(1)), r.getString(2), r.getBoolean(3)))).toMap
      assert(got("amount") == ((Some("bigint"), "double", true)), s"$got")
      assert(got("day") == ((Some("date"), "date", false)))
      assert(got("note") == ((None, "string", true)), "new columns flag as drifted")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("scan types_reference: type drift lands as gated measurements") {
    import graft.scan.Scanner
    val dir = java.nio.file.Files.createTempDirectory("typedrift2").toString
    try {
      Constraints.saveTypeAudit(
        Seq(("1", "2024-01-02"), ("22", "2024-02-03")).toDF("amount", "day"),
        Seq("amount", "day"), s"$dir/types")
      val yaml =
        s"""table_name: t
           |infer_types:
           |- amount
           |- day
           |types_reference: $dir/types
           |columns:
           |  amount:
           |    tests:
           |    - type_drift == 0
           |  day:
           |    tests:
           |    - type_drift == 0
           |""".stripMargin
      val cur = Seq(("1.5", "2024-03-04"), ("2.25", "2024-04-05")).toDF("amount", "day")
      val r = Scanner.executeYaml(spark, cur, yaml)
      def m(metric: String, c: String) = r.measurement(metric, Some(c)).get.value.get
      assert(m("inferred_type", "amount") == "double" && m("type_drift", "amount") == 1L)
      assert(m("type_drift", "day") == 0L)
      val verdicts = r.testResults.map(t => t.test.column -> t.passed).toMap
      assert(verdicts == Map(Some("amount") -> false, Some("day") -> true), s"$verdicts")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("inferTypes: classification counts and tightest-type suggestion") {
    val df = Seq(
      ("1", "1.5", "2024-01-02", "true", "abc", "a@b.co"),
      ("22", "2", "2024-02-03", "FALSE", "7", "x@y.org"),
      ("-3", ".5", "2024-03-04", "True", "8", "not an email")
    ).toDF("ints", "dbls", "dates", "bools", "mixed", "mails")
    val rows = Constraints.inferTypes(df,
      Seq("ints", "dbls", "dates", "bools", "mixed", "mails"), threshold = 0.9)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("ints").getAs[String]("suggested") == "bigint")
    assert(rows("ints").getAs[Long]("n_bigint") == 3L)
    assert(rows("ints").getAs[Long]("n_double") == 3L) // ints parse as doubles too
    assert(rows("dbls").getAs[String]("suggested") == "double")
    assert(rows("dbls").getAs[Long]("n_bigint") == 1L) // "2" alone
    assert(rows("dates").getAs[String]("suggested") == "date")
    assert(rows("bools").getAs[String]("suggested") == "boolean")
    assert(rows("mixed").getAs[String]("suggested") == "string") // 2/3 < 0.9
    assert(rows("mails").getAs[String]("suggested") == "string")
    assert(rows("mails").getAs[Long]("n_email") == 2L)
    // lower threshold tightens mixed to bigint, mails to email
    val loose = Constraints.inferTypes(df, Seq("mixed", "mails"), threshold = 0.6)
      .collect().map(r => r.getString(0) -> r.getAs[String]("suggested")).toMap
    assert(loose == Map("mixed" -> "bigint", "mails" -> "email"))
    // NULLs don't count as values; all-null column stays string
    val n = Seq((Option.empty[String], Option("5"))).toDF("a", "b")
    val nr = Constraints.inferTypes(n, Seq("a", "b"), threshold = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[String]("suggested")))
    assert(nr.toSet == Set(("a", 0L, "string"), ("b", 1L, "bigint")))
  }

  test("cramersV: perfect association 1, independence ~0, null exclusion") {
    // perfect: b determined by a (2x2, diagonal only)
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val p = Correlation.cramersV(perfect, Seq("a" -> "b")).collect()(0)
    assert(p.getLong(1) == 4L && p.getLong(2) == 2L && p.getLong(3) == 2L)
    assert(math.abs(p.getDouble(5) - 1.0) < 1e-9)
    // independent uniform 2x2: chi2 quantizes to exactly 0 via the guard
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val i = Correlation.cramersV(ind, Seq("a" -> "b")).collect()(0)
    assert(i.getDouble(4) >= 0.0 && i.getDouble(4) < 1e-6)
    assert(i.getDouble(5) < 1e-3)
    // single-level side: min(r-1,c-1)=0 -> V null, chi2 still defined
    val one = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val o = Correlation.cramersV(one, Seq("a" -> "b")).collect()(0)
    assert(o.isNullAt(5))
    // nulls excluded from n
    val n = Seq((Option("x"), Option("p")), (None, Option("q")), (Option("y"), None),
      (Option("y"), Option("q"))).toDF("a", "b")
    assert(Correlation.cramersV(n, Seq("a" -> "b")).collect()(0).getLong(1) == 2L)
  }

  test("linkagePairs: weighted field agreements, null = 0, match threshold") {
    import graft.ops.Joins.LinkField
    val people = Seq(
      (1L, "b", "john smith", Option("NY"), Option(10)),
      (2L, "b", "jon smith", Option("NY"), Option(10)),   // name within 1, both exact
      (3L, "b", "john smith", Option("LA"), None),        // name exact, seg off, nation null
      (4L, "b", "zzzz aaaa", Option("NY"), Option(10)),   // name far, others agree
      (5L, "c", "john smith", Option("NY"), Option(10))   // other block: never paired
    ).toDF("id", "blk", "name", "seg", "nat")
    val out = Joins.linkagePairs(people, "id", Seq("blk"), Seq(
      LinkField("name", 4000L, -1000L, maxDist = 1),
      LinkField("seg", 1000L, -500L),
      LinkField("nat", 800L, -400L)), minScoreFx = 4000L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(5), r.getBoolean(6))).toMap
    assert(out((1L, 2L)) == ((5800L, true)))   // 4000 + 1000 + 800
    assert(out((1L, 3L)) == ((3500L, false)))  // 4000 - 500 + 0 (null nation)
    assert(out((1L, 4L)) == ((800L, false)))   // -1000 + 1000 + 800
    assert(out((2L, 3L)) == ((3500L, false)))  // "jon"~"john" dist 1 agrees
    assert(!out.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("fuzzyPairs: blocked levenshtein pairs, lossless length prefilter") {
    val names = Seq(
      (1L, "g1", "alpha"), (2L, "g1", "alphb"),   // dist 1
      (3L, "g1", "alphaa"),                        // dist 1 to alpha (len diff 1)
      (4L, "g1", "zzzzz"),                         // far from all
      (5L, "g2", "alpha")                          // other block: never paired
    ).toDF("id", "g", "s")
    val got = Joins.fuzzyPairs(names, "id", "s", Seq("g"), maxDist = 1)
      .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("schemaDiff: added, dropped, type-changed; identical schemas empty; no Spark job") {
    import graft.ops.Constraints
    import org.apache.spark.sql.functions._
    val before = Seq((1L, "a", 1.5)).toDF("id", "name", "score")
    val after = before.drop("name")
      .withColumn("score", col("score").cast("decimal(10,2)"))
      .withColumn("added_at", lit("2024-01-01"))
    val diff = Constraints.schemaDiff(before.schema, after.schema)
    assert(diff == Seq(
      ("added_at", "added", None, Some("STRING")),
      ("name", "dropped", Some("STRING"), None),
      ("score", "type_changed", Some("DOUBLE"), Some("DECIMAL(10,2)"))))
    assert(Constraints.schemaDiff(before.schema, before.schema).isEmpty)
    val frame = Constraints.schemaDiffFrame(spark, before.schema, after.schema)
    assert(frame.columns.toSeq == Seq("column", "change", "before_type", "after_type"))
    assert(frame.count() == 3)
  }
}
