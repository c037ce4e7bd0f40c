package graft

import org.apache.spark.sql.functions._

/** Null-input robustness sweep: every query must run against tables whose
  * VALUE columns carry nulls (keys stay non-null — a null key is an
  * upstream-contract violation; a null payload/measure is Tuesday).
  *
  * The fixtures are null-free, so operators have never been exercised on
  * the real-world case: text that failed extraction, events without a
  * payload, measures that didn't parse. Each nullable column is nulled on
  * a deterministic ~10% slice. No-throw is the contract under test —
  * null-PROPAGATION semantics per expression live in ExprSpec.
  */
class NullInputSpec extends SparkSpec {

  private lazy val nulledDir: String = {
    val dir = SparkSpec.scratchDir("graft_nulls")
    def copy(name: String, holes: Map[String, String]): Unit = {
      val base = Tables.t(spark, sfDir, name)
      val out = holes.foldLeft(base) { case (df, (c, cond)) =>
        df.withColumn(c, when(expr(cond), lit(null)).otherwise(col(c)))
      }
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    copy("region", Map.empty)
    copy("nation", Map("n_name" -> "n_nationkey % 7 = 3"))
    copy("customer", Map("c_mktsegment" -> "c_custkey % 11 = 3",
      "c_acctbal" -> "c_custkey % 13 = 3"))
    copy("supplier", Map("s_name" -> "s_suppkey % 7 = 3"))
    copy("part", Map("p_name" -> "p_partkey % 7 = 3"))
    copy("orders", Map("o_totalprice" -> "o_orderkey % 11 = 3",
      "o_orderstatus" -> "o_orderkey % 13 = 3"))
    copy("lineitem", Map("l_discount" -> "l_orderkey % 11 = 3",
      "l_quantity" -> "l_orderkey % 13 = 3"))
    copy("events", Map("value" -> "event_id % 11 = 3",
      "props" -> "event_id % 13 = 3",
      "event_type" -> "event_id % 17 = 3"))
    copy("documents", Map("text" -> "doc_id % 11 = 3",
      "lang" -> "doc_id % 13 = 3"))
    copy("embeddings", Map("embedding" -> "vec_id % 11 = 3"))
    dir
  }

  test("every query survives null value columns (no-throw contract)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, nulledDir).write.format("noop").mode("overwrite").save()
          InternalCaches.unpersistAll()
          None
        } catch {
          case e: Throwable =>
            InternalCaches.unpersistAll()
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries threw on nulled input:\n${failures.mkString("\n")}")
  }
}
