package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared scaffold of the TWO-PASS distributed prefix composition — the
  * engine's standard answer to "this needs a GLOBAL running
  * sum/max/offset" without the partition-less window that funnels the
  * whole corpus through ONE task:
  *
  *   1. range-partition the relation on the prefix ordering key and
  *      stamp each row with its physical partition id ([[rangedByPid]]);
  *   2. run the running aggregate per-pid in parallel keyed windows;
  *   3. reduce each partition to a total, prefix-scan the
  *      partition-count-sized totals relation into exclusive start
  *      offsets ([[sumOffsets]] for the additive case), broadcast them
  *      back, and combine: `local + offset` is the global prefix under
  *      ANY partitioning (boundary invariance — each consumer pins this
  *      law against a single-window oracle).
  *
  * Used by `text_pack_sequences`, `agg_ks_test` (two summed columns —
  * custom offsets over the same scaffold), `stream_watermark_late`
  * (prefix MAX — custom offsets), and `mm_shard_manifest_global`. One
  * definition, because the correctness contract is identical everywhere:
  * the partitioned relation MUST persist eagerly so both phases read the
  * SAME materialized partition assignment — range boundaries come from
  * sampling and `spark_partition_id` is declared nondeterministic, so
  * independent recomputes could disagree on pid placement and silently
  * misalign offsets (review finding r10: this scaffold existed as four
  * hand-rolled copies).
  */
object TwoPass {
  /** Pass-0 scaffold: `df` range-partitioned by `key` at
    * defaultParallelism with the physical partition id stamped, persisted
    * EAGERLY (both downstream phases must read one materialization — see
    * object doc).
    */
  private[ops] def rangedByPid(df: DataFrame, keys: Column*): DataFrame =
    graft.InternalCaches.persistTracked(
      df.repartitionByRange(
          df.sparkSession.sparkContext.defaultParallelism, keys: _*)
        .withColumn("pid", spark_partition_id()),
      eager = true)

  /** Exclusive per-partition start offsets of `sum(value)`: one row per
    * pid with the sum of all PRIOR partitions (0 for the first). The
    * prefix window runs over the partition-count-sized totals relation —
    * the one deliberately partition-less window in the composition.
    */
  private[ops] def sumOffsets(part: DataFrame, value: Column): DataFrame =
    part.groupBy(col("pid")).agg(sum(value).as("ptot"))
      .withColumn("offset",
        coalesce(sum(col("ptot")).over(
          Window.orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("offset"))
}
