package graft

/** Ingest/egress contracts (SURVEY.md §2.3 scans/sinks): the O1 chunking
  * shape (W part-files) and the O2 text scan of the reference's own input.
  */
class IoSpec extends SparkSpec {

  test("scan_text reads the reference data.txt (50 records, sorted)") {
    val df = SparkEntry.queries("scan_text")(spark, sfDir)
    val rows = df.collect().map(_.getString(0))
    assert(rows.length == 50)
    assert(rows.sameElements(rows.sorted), "READ presents lines in string order")
    assert(rows.exists(_.contains("Las Vegas")))
  }

  test("sink_partitioned_text writes exactly W=3 part-files (O1 chunking)") {
    SparkEntry.queries("sink_partitioned_text")(spark, sfDir).count()
    // the REAL pid-keyed path the operator wrote this run — a
    // reconstructed path would silently assert against stale files from
    // a previous process layout
    val dir = ops.IO.tmpDir(sfDir, "text")
    assert(ops.IO.partFileCount(dir) == 3,
      s"expected 3 chunks ≡ 3 workers, got ${ops.IO.partFileCount(dir)}")
  }

  test("sink_compact: 64 small part-files compact to the declared 4") {
    SparkEntry.queries("sink_compact")(spark, sfDir).count()
    val small = ops.IO.partFileCount(ops.IO.tmpDir(sfDir, "compact_small"))
    val out = ops.IO.partFileCount(ops.IO.tmpDir(sfDir, "compact_out"))
    assert(small == 64, s"pathology stage must write 64 files, got $small")
    assert(out == 4, s"compaction must write the declared 4, got $out")
  }

  test("sink_clustered: output files tile disjoint z-ranges (file skipping)") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("sink_clustered")(spark, sfDir).count()
    // per-file [min,max] of the z-value: range-partition + in-partition
    // sort means every parquet footer covers a z-interval no other file
    // overlaps — the property min/max file skipping needs. Equal z-values
    // land in ONE range partition, so adjacent intervals are strictly
    // disjoint, not merely non-nested.
    val ranges = spark.read.parquet(ops.IO.clusteredDir(sfDir))
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zval")).as("lo"), max(col("zval")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length >= 2,
      s"clustered write must produce multiple files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) =>
        assert(hiPrev < loNext,
          s"file z-ranges overlap: hi=$hiPrev >= nextLo=$loNext")
      case _ => ()
    }
  }

  test("sink_parquet roundtrip preserves rows and schema") {
    val df = SparkEntry.queries("sink_parquet")(spark, sfDir)
    assert(df.count() == 5)
    assert(df.schema.fieldNames.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("malformed delimited rows drop under DROPMALFORMED (mapper.py arity semantics)") {
    // the reference's mapper silently drops rows that don't parse into the
    // declared arity (`mapper.py:29`); the engine's declarative equivalent
    // is the CSV reader's mode — demonstrated against a file with a bad row
    val dir = java.nio.file.Paths.get(SparkSpec.scratchDir("graft_badcsv"))
    java.nio.file.Files.writeString(dir.resolve("part-0.tsv"),
      "1\talpha\n2\tbeta\nnot_an_int\tgamma\n3\tdelta\n")
    val df = spark.read
      .schema("id INT, name STRING")
      .option("sep", "\t").option("mode", "DROPMALFORMED")
      .csv(dir.toString)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("scan_csv_schema scans a real delimited file with declared types") {
    val df = SparkEntry.queries("scan_csv_schema")(spark, sfDir)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq(("r_regionkey", "int"), ("r_name", "string")))
    assert(df.count() == 5)
  }
}
