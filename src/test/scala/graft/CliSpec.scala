package graft

import java.nio.file.{Files, Paths}

import graft.compat.ClientCli

/** The reference CLI surface (`-w` / `-r` / `-mr`, `Client/client.py:46-71`)
  * over the engine: chunking law, merge-sort presentation, and external
  * map/reduce script parity with the in-JVM MrJob facade.
  */
class CliSpec extends SparkSpec {

  private def dataCopy(): String = {
    val src = ops.IO.materializedResource("data.txt")
    val dst = Paths.get(SparkSpec.scratchDir("graft_cli")).resolve("data.txt")
    Files.copy(Paths.get(src), dst)
    dst.toString
  }

  test("-w splits into W CONTIGUOUS line chunks; -r restores the sorted merge") {
    import spark.implicits._
    val file = dataCopy()
    val raw = Files.readAllLines(Paths.get(file)).toArray.map(_.toString).toSeq
    val out = ClientCli.write(spark, file, workers = 3)
    assert(ops.IO.partFileCount(out) == 3,
      "W part-files ≡ W worker chunks (the reference's fixed-W layout)")
    // contiguity law: the reference splits by line count, not hash — every
    // chunk is a contiguous slice of the input (Client/client.py:147-191)
    val per = (raw.size + 2) / 3
    val chunks = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      .sortBy(_.getName)
      .map(f => Files.readAllLines(f.toPath).toArray.map(_.toString).toSeq)
    assert(chunks.map(_.size).toSeq == raw.grouped(per).map(_.size).toSeq)
    assert(chunks.flatten.toSeq == raw,
      "concatenated chunks must reproduce the input in order")
    // -r: merge + whole-line lexicographic sort (client.py:105-108)
    assert(ClientCli.read(spark, file).collect().toSeq == raw.sorted)
    val artifact = Paths.get(file.stripSuffix(".txt") + "_part-00000.txt")
    assert(Files.exists(artifact),
      "read must save the merged artifact beside the source")
    // artifact byte layout = the reference's client-side merge: every line
    // (including the last) terminated by '\n'
    assert(new String(Files.readAllBytes(artifact), "UTF-8")
      == raw.sorted.mkString("", "\n", "\n"))
  }

  test("-mr external scripts agree with the in-JVM MrJob wordcount") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val file = dataCopy()
    val dir = Paths.get(file).getParent
    val mapper = dir.resolve("wc_map.py")
    val reducer = dir.resolve("wc_red.py")
    Files.write(mapper,
      """import sys
        |for line in sys.stdin:
        |    for t in line.split():
        |        print(t + ",1")
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(reducer,
      """import sys
        |prev, n = None, 0
        |for line in sys.stdin:
        |    line = line.strip()
        |    if not line: continue
        |    k = line.split(",")[0]  # first-comma key, = Mr.keyOf
        |    if prev is not None and k != prev:
        |        print(prev + "," + str(n)); n = 0
        |    prev = k; n += 1
        |if prev is not None: print(prev + "," + str(n))
        |""".stripMargin.getBytes("UTF-8"))
    ClientCli.write(spark, file, workers = 3)
    val runsDir = ClientCli.mapReduce(spark, file,
      mapper.toString, reducer.toString, workers = 3)
    val piped = spark.read.textFile(runsDir).collect().toSet
    // the same job through the typed facade (Scala functions, same shuffle)
    val lines = spark.read.textFile(file + "_chunks")
    val scala0 = ops.Mr.run(spark, lines,
      mapLine = _.split("\\s+").iterator.filter(_.nonEmpty).map(t => s"$t,1"),
      reducers = 3,
      reduceRun = in => {
        val buf = in.buffered
        new Iterator[String] {
          def hasNext: Boolean = buf.hasNext
          def next(): String = {
            val k = ops.Mr.keyOf(buf.head)
            var n = 0L
            while (buf.hasNext && ops.Mr.keyOf(buf.head) == k) {
              buf.next(); n += 1
            }
            s"$k,$n"
          }
        }
      }).collect().toSet
    assert(piped.nonEmpty && piped == scala0,
      s"script/facade disagree: only-script=${piped -- scala0} " +
        s"only-facade=${scala0 -- piped}")
  }
}
