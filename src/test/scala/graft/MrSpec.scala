package graft

import org.apache.spark.sql.functions._
import graft.compat.Flagship
import graft.ops.Mr

/** MR compat surface tests: the flagship golden-file byte-diff (SURVEY.md
  * §5.2 item 2) and the partition-contract probes (§5.2 item 3).
  */
class MrSpec extends SparkSpec {

  private def resourcePath(name: String): String =
    getClass.getResource(s"/reference/$name").getPath

  test("flagship MR job byte-matches the reference golden output") {
    val got = Flagship.run(spark, resourcePath("data.txt"))
    val goldenBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(resourcePath("data_part-00000.txt")))
    val golden = new String(goldenBytes, java.nio.charset.StandardCharsets.UTF_8)
    assert(got.mkString("", "\n", "\n") == golden,
      s"flagship output diverged from golden:\n${got.mkString("\n")}")
  }

  test("flagship reproduces the documented quirks (Los row, float repr)") {
    val got = Flagship.run(spark, resourcePath("data.txt"))
    assert(got.contains("Los,164.5"), "stray-tab row must surface as location 'Los'")
    assert(got.contains("San Francisco,388.3"), "float repr must be shortest (388.3, not 388.30)")
    assert(got.size == 40)
  }

  test("flagship reducer replicates the falsy-key quirk (reducer.py:33)") {
    // `if old_key and old_key != current_key` is false for old_key == "",
    // so the empty key's group is never flushed: its running max (5.0)
    // leaks into the atlanta group, whose own 3.0 never exceeds it
    val leaked = Flagship.reduceRun(
      Iterator(",5.0", "atlanta,3.0", "boston,7.0")).toSeq
    assert(leaked == Seq("atlanta,5.0", "boston,7.0"), leaked)
    // and ordinary runs flush per key exactly as before
    val plain = Flagship.reduceRun(
      Iterator("a,1.5", "a,0.5", "b,2.5")).toSeq
    assert(plain == Seq("a,1.5", "b,2.5"), plain)
  }

  test("sort_within_partitions: keys co-located and each partition ordered") {
    import spark.implicits._
    val df = SparkEntry.queries("sort_within_partitions")(spark, sfDir)
    val probe = df
      .select(col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val rows = it.toVector
        val sorted = rows == rows.sortBy(identity)
        Iterator((sorted, rows.map(_._1).distinct.toSet))
      }
      .collect()
    assert(probe.forall(_._1), "every partition must be sorted on (key, line)")
    // hash partitioning: no l_orderkey may appear in two partitions
    val all = probe.flatMap(_._2)
    assert(all.length == all.distinct.length,
      "a key appearing in two partitions breaks the reduce contract")
  }

  test("mr_wordcount truncates comma-bearing tokens at the first comma (compat)") {
    import spark.implicits._
    // the reference keys map-output lines on the pre-first-comma prefix
    // (worker.py:122); a token containing a comma therefore counts under
    // its prefix. The shipped fixtures are comma-free, so this planted
    // corpus is the only thing standing between the engine and a silent
    // oracle divergence on punctuated text (the oracle models the same
    // split_part truncation).
    val dir = SparkSpec.scratchDir("graft_mr_commas")
    Seq((1L, "foo foo,bar baz", "en", "crawl", 15L),
        (2L, "baz ,tail", "en", "crawl", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("mr_wordcount")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // "foo,bar" counts under "foo"; ",tail" truncates to the empty key
    assert(got == Map("foo" -> 2L, "baz" -> 2L, "" -> 1L),
      s"got $got")
  }

  test("pipe parity: external python3 reduce == native fold through MrJob") {
    import spark.implicits._
    // the same word-count job, once with the JVM streaming fold and once
    // with the reduce stage as a real external python3 process over the
    // sorted run — Hadoop-Streaming parity beyond a fixed example script
    val lines = spark.createDataset(Seq(
      "x y z", "y z", "z z x", "w", "x y"))
    val mapFn = (l: String) =>
      l.split(" ").iterator.filter(_.nonEmpty).map(t => s"$t,1")
    val native = Mr.run(spark, lines, mapFn, 3, it => {
      val b = it.buffered
      new Iterator[String] {
        def hasNext = b.hasNext
        def next() = {
          val k = Mr.keyOf(b.head)
          var n = 0L
          while (b.hasNext && Mr.keyOf(b.head) == k) { b.next(); n += 1 }
          s"$k,$n"
        }
      }
    }).orderBy("value").as[String].collect().toSeq
    val py =
      """import sys
        |cur, n = None, 0
        |for line in sys.stdin:
        |    k = line.strip().split(',')[0]
        |    if cur is not None and k != cur:
        |        print(f"{cur},{n}"); n = 0
        |    cur = k; n += 1
        |if cur is not None:
        |    print(f"{cur},{n}")""".stripMargin
    val piped = Mr.run(spark, lines, mapFn, 3,
        it => it /* sort only; reduce via pipe below */)
      .rdd.pipe(Seq("python3", "-c", py))
      .toDS().orderBy("value").as[String].collect().toSeq
    assert(native == piped, s"native=$native piped=$piped")
  }

  test("MrJob: any valid partitioner yields identical final results (W-swappability)") {
    import spark.implicits._
    val lines = spark.createDataset(Seq(
      "a\t1", "b\t2", "a\t3", "c\t4", "b\t5", "a\t6"))
    def job(w: Int): Seq[String] = {
      val out = Mr.run(spark, lines,
        mapLine = l => { val f = l.split("\t"); Iterator(s"${f(0)},${f(1)}") },
        reducers = w,
        reduceRun = it => {
          val b = it.buffered
          new Iterator[String] {
            def hasNext = b.hasNext
            def next() = {
              val k = Mr.keyOf(b.head)
              var n = 0L
              while (b.hasNext && Mr.keyOf(b.head) == k) { b.next(); n += 1 }
              s"$k,$n"
            }
          }
        })
      out.orderBy("value").as[String].collect().toSeq
    }
    val expected = Seq("a,3", "b,2", "c,1")
    assert(job(1) == expected && job(3) == expected && job(7) == expected,
      "reduce results must be invariant to the partition count / hash fn " +
        "(YaMR-1.pdf modular-hash requirement)")
  }
}
