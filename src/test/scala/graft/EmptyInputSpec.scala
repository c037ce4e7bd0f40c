package graft

/** Empty-input robustness sweep: every query must run — not necessarily
  * return rows — against schema-correct but EMPTY tables.
  *
  * This is the empty-partition / empty-day production case: a pipeline
  * stage fed by an upstream filter that matched nothing must produce an
  * empty (or aggregate-identity) result, never throw. Operators with
  * planted-data synthesis (re-crawl, PII, normalization mess) synthesize
  * from the input, so they degrade to empty with it; the iterative CC
  * loop must converge in one round on an empty edge set.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = SparkSpec.scratchDir("graft_empty")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // limit(0) through the REAL loader keeps schema + reader conf
      // (nanos ts handling) identical to the populated tables
      Tables.t(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query survives empty input (no rows is a result, a throw is a bug)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).write.format("noop").mode("overwrite").save()
          InternalCaches.unpersistAll()
          None
        } catch {
          case e: Throwable =>
            InternalCaches.unpersistAll()
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries threw on empty input:\n${failures.mkString("\n")}")
  }
}
