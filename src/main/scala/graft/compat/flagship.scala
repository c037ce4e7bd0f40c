package graft.compat

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.ops.Mr

/** Reference-quirk-exact flagship job (SURVEY.md §5.2 item 2): the example
  * MR pipeline `mapper.py` + `reducer.py` + READ merge-sort, reproduced so
  * its output byte-matches the committed golden artifact
  * `Client/temp/data_part-00000.txt`.
  *
  * Quirks deliberately preserved (FIXTURES.md §A, SURVEY.md §2.1 fine print):
  *  - arity filter: lines without exactly 6 tab-separated fields are
  *    dropped silently (`mapper.py:29`); the stray-tab row 16 passes with
  *    location "Los".
  *  - reducer MAX initializes to 0 (`reducer.py:16,33`) — wrong for
  *    all-negative groups; a group never exceeding 0 prints integer "0".
  *  - values print in Python float repr (shortest round-trip: `388.3`, not
  *    `388.30`) — Scala's `Double.toString` is the same shortest-repr
  *    algorithm for values in this range.
  *  - final presentation sorts WHOLE "key,value" lines lexicographically
  *    (`Client/client.py:105-108`), so "Los,…" < "Louisville,…".
  *  - the reducer's key-change test is `if old_key and old_key != key`
  *    (`reducer.py:33`): an EMPTY-STRING key is falsy, so its group is
  *    never flushed and its running max leaks into the next key's group.
  *    Replicated below (not present in data.txt, but byte-parity means
  *    byte-parity).
  *
  * The clean-semantics engine ops live in `graft.ops`; this module exists
  * only for golden-diff parity with the reference artifact.
  */
object Flagship {

  /** Python repr of the reducer's running max: int "0" if never updated
    * past the 0 init, else the float's shortest repr.
    */
  private def pyRepr(maxV: Double, updated: Boolean): String =
    if (!updated) "0" else maxV.toString

  /** mapper.py: 6-field TSV → "location,cost"; malformed rows dropped. */
  def mapLine(line: String): IterableOnce[String] = {
    val f = line.trim.split("\t", -1)
    if (f.length == 6) Iterator(s"${f(2)},${f(4)}") else Iterator.empty
  }

  /** reducer.py: streaming per-key MAX over a sorted run — a faithful
    * transliteration of the reference loop (`reducer.py:16-40`), quirks
    * and all: init-0 max, skip-malformed, Python float repr, and the
    * falsy-key branch (`if old_key and old_key != current_key`) under
    * which an empty-string key's group is never flushed — its max and
    * `updated` state carry into the next group.
    *
    * The output buffer holds one line per distinct key in the run (the
    * reference materializes the entire sorted run in RAM before reducing,
    * `Worker/worker.py:179-183`; this holds only the reduce OUTPUT).
    */
  def reduceRun(in: Iterator[String]): Iterator[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var maxV = 0.0
    var updated = false
    var oldKey: String = null
    in.foreach { line =>
      val p = line.trim.split(",", -1)
      if (p.length == 2) {
        val key = p(0)
        if (oldKey != null && oldKey.nonEmpty && oldKey != key) {
          out += s"$oldKey,${pyRepr(maxV, updated)}"
          maxV = 0.0; updated = false
        }
        oldKey = key
        val v = p(1).toDouble
        if (v > maxV) { maxV = v; updated = true }
      }
    }
    if (oldKey != null) out += s"$oldKey,${pyRepr(maxV, updated)}"
    out.iterator
  }

  /** Full job: WRITE(3 chunks) → map → shuffle → sort → reduce → READ
    * merge + global line sort. Returns the final sorted lines.
    */
  def run(spark: SparkSession, dataPath: String): Seq[String] = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.textFile(dataPath)
    val reduced = Mr.run(spark, lines, mapLine, reducers = 3, reduceRun)
    // O2 READ: merge all runs and sort full lines (string order)
    reduced.orderBy("value").as[String].collect().toSeq
  }
}
