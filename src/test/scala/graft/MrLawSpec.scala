package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.ops.Mr

/** Property-based MR-equivalence laws (SURVEY.md §5.2 item 4): for random
  * datasets and a pure per-key fold, the MR pipeline (map → hash partition
  * → partition sort → streaming fold) must equal the declarative
  * groupBy-aggregate — the statement that the MrJob facade and the
  * DataFrame engine compute the same algebra. Covers empty partitions
  * (W > rows, the reference's blank-padding case) and single-key skew by
  * generator construction.
  */
object MrLawSpec extends Properties("MrJob") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each case runs full Spark jobs

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genKey = Gen.oneOf("k1", "k2", "k3", "hot", "z")
  private val genRow = for { k <- genKey; v <- Gen.chooseNum(0L, 9999L) }
    yield (k, v)
  private val genData = Gen.listOfN(40, genRow).flatMap(Gen.someOf(_))
    .map(_.toList)

  /** Streaming per-key MAX over a sorted run (the reducer contract). */
  private def maxRun(in: Iterator[String]): Iterator[String] = {
    val b = in.buffered
    new Iterator[String] {
      def hasNext: Boolean = b.hasNext
      def next(): String = {
        val k = Mr.keyOf(b.head)
        var m = Long.MinValue
        while (b.hasNext && Mr.keyOf(b.head) == k)
          m = math.max(m, b.next().substring(k.length + 1).toLong)
        s"$k,$m"
      }
    }
  }

  private def viaMr(data: List[(String, Long)], w: Int): Map[String, Long] = {
    val lines = spark.createDataset(data.map { case (k, v) => s"$k\t$v" })
    Mr.run(spark, lines,
        mapLine = l => { val f = l.split("\t"); Iterator(s"${f(0)},${f(1)}") },
        reducers = w, reduceRun = maxRun)
      .collect()
      .map { l => val k = Mr.keyOf(l); k -> l.substring(k.length + 1).toLong }
      .toMap
  }

  private def viaDf(data: List[(String, Long)]): Map[String, Long] =
    data.toDF("k", "v").groupBy($"k").agg(max($"v").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  property("pipeline(map|shuffle|sort|fold) == groupBy.agg(fold)") =
    Prop.forAll(genData, Gen.chooseNum(1, 6)) { (data, w) =>
      viaMr(data, w) == viaDf(data)
    }

  property("empty partitions are legal: W far above row count") =
    Prop.forAll(Gen.listOfN(3, genRow)) { data =>
      viaMr(data, 16) == viaDf(data)
    }

  property("single-key skew folds to one row") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 9999L))) { vs =>
      val data = vs.map(("hot", _))
      viaMr(data, 4) == Map("hot" -> vs.max)
    }
}
