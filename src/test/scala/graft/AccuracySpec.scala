package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the approximate operators (SURVEY.md §2.3 ◐ rows):
  * the sketch result must sit within its declared error of the exact
  * answer — the check the driver's oracle can't do (no_oracle by design).
  */
class AccuracySpec extends SparkSpec {

  test("agg_approx_distinct: HLL estimate within ±5% of exact per group") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) <= 0.05 * ex + 1,
        s"group $k: approx $ap vs exact $ex exceeds ±5%")
    }
  }
}
