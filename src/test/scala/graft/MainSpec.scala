package graft

import org.apache.spark.sql.functions._

class MainSpec extends SparkSpec {
  import spark.implicits._

  private def withTable(test: (String, String) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val table = s"$dir/t.parquet"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("id", "name", "amount").write.mode("overwrite").parquet(table)
    val yml = s"$dir/scan.yml"
    test(table, yml)
  }

  private def runCli(yaml: String, yml: String, table: String, vars: String*): (Int, String) = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(yml), yaml)
    val buf = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(buf)) {
      Main.run(Array(yml, table) ++ vars, Some(spark))
    }
    (code, buf.toString)
  }

  test("CLI end-to-end: prints measurements/tests, exit 0 on pass, 1 on failure") {
    withTable { (table, yml) =>
      val passing =
        """table_name: t
          |metrics:
          |- row_count
          |- missing_count
          |tests:
          |- row_count > 0
          |columns:
          |  name:
          |    tests:
          |    - missing_count <= 1
          |""".stripMargin
      val (code, out) = runCli(passing, yml, table)
      assert(code == 0, out)
      assert(out.contains("row_count = 3"))
      assert(out.contains("PASS  row_count > 0"))
      assert(out.contains("PASS  missing_count <= 1"))

      val failing = passing.replace("missing_count <= 1", "missing_count == 0")
      val (code2, out2) = runCli(failing, yml, table)
      assert(code2 == 1, out2)
      assert(out2.contains("FAIL  missing_count == 0"))
    }
  }

  test("CLI variables substitute into the filter; bad usage exits 2") {
    withTable { (table, yml) =>
      val yaml =
        """table_name: t
          |filter: amount >= {{ min_amount }}
          |metrics:
          |- row_count
          |tests:
          |- row_count == 2
          |""".stripMargin
      val (code, out) = runCli(yaml, yml, table, "min_amount=15")
      assert(code == 0, out)
      assert(out.contains("row_count = 2"))
      assert(Main.run(Array("only-one-arg"), Some(spark)) == 2)
      assert(Main.run(Array(yml, "/nonexistent/path.parquet"), Some(spark)) == 2)
    }
  }
}
