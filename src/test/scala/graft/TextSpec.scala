package graft

/** Near-dup method cross-checks: two independent sketches (MinHash-LSH
  * with exact-Jaccard verify, SimHash band blocking with hamming verify)
  * must surface the same planted near-duplicate pairs — the strongest
  * oracle-free evidence either one is right.
  */
class TextSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_simhash finds exactly the pairs dedup_near_minhash verifies") {
    val mh = pairs("dedup_near_minhash")
    val sh = pairs("dedup_simhash")
    assert(mh.nonEmpty, "fixture must contain planted near-dups")
    assert(sh == mh,
      s"simhash/minhash disagree: only-simhash=${sh -- mh} only-minhash=${mh -- sh}")
  }

  test("dedup_exact keeps one representative per content group") {
    val df = SparkEntry.queries("dedup_exact")(spark, sfDir)
    val total = Tables.documents(spark, sfDir).count()
    assert(df.count() == total, "every distinct text keeps exactly one id")
    // the synthetic re-crawl duplicates every 10th doc: those groups
    // report 2 copies, all others 1
    val dups = df.filter("n_copies = 2").count()
    assert(dups == (total + 9) / 10)
  }
}
