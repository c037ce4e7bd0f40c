package graft.expr

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter build + probe for semi-join reduction (the runtime-filter
  * pattern): aggregate the build side's join keys into a fixed-size bitset,
  * broadcast the one-row blob, and prefilter the probe side BEFORE its
  * shuffle — only rows that might match ever enter the join exchange. At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the ~matching slice; the exact join downstream removes
  * the false positives, so composed results stay exact.
  *
  * Reference anchor: the reference has no optimizer at all (SURVEY.md
  * §4.1) — every byte of every file flows through its shuffle
  * (`Worker/worker.py:118-131`). This operator is the declarative
  * counter-design: data-dependent pruning computed inside the engine.
  *
  * Contract shared by both sides (MUST stay in lockstep):
  *   h    = xxhash64(key)            — Spark's seed-42 XXH64 over a long
  *   g    = xxhash64(h)              — second independent stream
  *   base = floorMod(h, M); step = floorMod(g, M-1) + 1  (never 0)
  *   posᵢ = (base + i·step) mod M, i ∈ 0..K-1   — double hashing
  * The build side runs it in JVM scalar code (`XXH64.hashLong(·, 42)` —
  * the very function the SQL `xxhash64` builtin compiles to), the probe
  * side as codegen'd Column arithmetic; ExprSpec pins the no-false-
  * negative law that keeps them honest.
  *
  * Sizing: M = 65536 bits (8 KiB — broadcast cost is trivial), K = 3.
  * For n keys the false-positive rate is ≈ (1 − e^(−Kn/M))^K: ~1e-7 at
  * n = 100, ~2% at n = 10k. A production caller sizes M to its dim
  * cardinality; the engine keeps one size because the law tests and the
  * oracle make exactness independent of FPP.
  */
object BloomFilter {
  val NumBits = 65536
  private val NumWords = NumBits / 64
  val NumHashes = 3

  /** Build-side positions for one key — the scalar twin of [[mightContain]]. */
  private[graft] def positions(key: Long): Array[Int] = {
    val h = XXH64.hashLong(key, 42L)
    val g = XXH64.hashLong(h, 42L)
    val base = java.lang.Math.floorMod(h, NumBits.toLong)
    val step = java.lang.Math.floorMod(g, (NumBits - 1).toLong) + 1
    Array.tabulate(NumHashes)(i => ((base + i * step) % NumBits).toInt)
  }

  /** Typed aggregate folding join keys into the bitset. Mergeable (bitwise
    * OR), so it partial-aggregates map-side like any sum; state is a flat
    * long array, 8 KiB regardless of input rows.
    */
  val agg: Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long](NumWords)
      def reduce(b: Array[Long], key: Long): Array[Long] = {
        positions(key).foreach(p => b(p >> 6) |= 1L << (p & 63))
        b
      }
      def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < NumWords) { x(i) |= y(i); i += 1 }
        x
      }
      def finish(r: Array[Long]): Array[Long] = r
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    }

  /** Probe predicate: true iff every one of `key`'s bit positions is set
    * in `bloom` (an array<bigint> column from [[agg]]). Pure built-in
    * Column arithmetic — stays inside whole-stage codegen, pushable below
    * the probe side's exchange. `call_function("shiftleft", …)` is the
    * variable-distance shift the Scala DSL lacks (its `shiftleft` only
    * takes a literal distance).
    */
  def mightContain(bloom: Column, key: Column): Column = {
    // cast(long): the build side hashes Longs (XXH64.hashLong); Spark's
    // xxhash64 dispatches per input type (hashInt ≠ hashLong for the
    // same value), so an int32 probe column would break the build/probe
    // lockstep and produce FALSE NEGATIVES — silently dropped join rows
    val h = xxhash64(key.cast("long"))
    val g = xxhash64(h) // h is long — same path as the build side
    val base = pmod(h, lit(NumBits.toLong))
    val step = pmod(g, lit((NumBits - 1).toLong)) + lit(1L)
    (0 until NumHashes).map { i =>
      val pos = pmod(base + lit(i.toLong) * step, lit(NumBits.toLong))
        .cast("int")
      val word = element_at(bloom, shiftright(pos, 6) + lit(1))
      val mask = call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63)))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
