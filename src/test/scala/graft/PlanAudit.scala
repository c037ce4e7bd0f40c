// Plan audit (dev tool): dump per-query physical-plan signals so a human
// can spot scale problems — cartesian products, nested-loop joins where an
// equi-join was intended, shuffle counts, unpushed scans.
// Run: sbt "Test/runMain graft.PlanAudit"
package graft

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val s = df.queryExecution.executedPlan.toString
        def c(tok: String) = s.sliding(tok.length).count(_ == tok)
        println(f"$name%-24s shuffles=${c("Exchange hashpartitioning") + c("Exchange rangepartitioning")}%-3d " +
          f"cartesian=${c("CartesianProduct")}%-2d bnlj=${c("BroadcastNestedLoop")}%-2d " +
          f"bhj=${c("BroadcastHashJoin")}%-2d smj=${c("SortMergeJoin")}%-2d " +
          f"aqe=${s.contains("AdaptiveSparkPlan")}")
      } catch { case e: Throwable =>
        println(f"$name%-24s AUDIT-ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
