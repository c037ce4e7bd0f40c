package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing contracts: payload fidelity, partition-batched
  * decode determinism, and the feature schema a downstream consumer binds.
  */
class MultimodalSpec extends SparkSpec {

  test("payload bytes roundtrip the binary column exactly") {
    import spark.implicits._
    val row = Multimodal.mediaTable(spark, sfDir)
      .filter($"doc_id" === 0L).head()
    val text = Tables.documents(spark, sfDir)
      .filter($"doc_id" === 0L).select("text").as[String].head()
    assert(row.payload.sameElements(text.getBytes("UTF-8")))
  }

  test("mm_decode_features is deterministic and schema-stable") {
    val a = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    val b = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    assert(a.sameElements(b), "stubbed decode must be a pure function")
    val schema = SparkEntry.queries("mm_decode_features")(spark, sfDir)
      .schema.map(f => (f.name, f.dataType.simpleString))
    assert(schema == Seq(("doc_id", "bigint"), ("width", "int"),
      ("height", "int"), ("mean_byte", "double")))
  }

  test("decode runs per partition, touching every row exactly once") {
    import spark.implicits._
    val n = Tables.documents(spark, sfDir).count()
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir))
    assert(feats.count() == n)
    assert(feats.select(countDistinct($"doc_id")).as[Long].head() == n)
  }

  test("metadata projection prunes the payload from the feature read") {
    // metadata-only query: the blob column must not survive into the
    // aggregate (column pruning over the derived payload)
    val df = SparkEntry.queries("mm_meta")(spark, sfDir)
      .select("doc_id", "n_bytes")
    assert(df.count() == 500)
  }
}
