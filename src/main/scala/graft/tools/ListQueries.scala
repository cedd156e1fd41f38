package graft.tools

/** Prints every gate name in the query catalog, one per line — the work
  * list for tools/freshbench.sh's one-JVM-per-gate mode (no SparkSession,
  * so it costs nothing to invoke).
  */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
