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
  val NumHashes = 3

  /** Build-side positions for one key — the scalar twin of [[mightContain]].
    * `numBits` parameterizes the sized variants below; the default is the
    * fixed 8 KiB dim-side filter.
    */
  private[graft] def positions(key: Long,
                               numBits: Int = NumBits): Array[Int] = {
    val h = XXH64.hashLong(key, 42L)
    val g = XXH64.hashLong(h, 42L)
    val base = java.lang.Math.floorMod(h, numBits.toLong)
    val step = java.lang.Math.floorMod(g, (numBits - 1).toLong) + 1
    Array.tabulate(NumHashes)(i => ((base + i * step) % numBits).toInt)
  }

  /** Typed aggregate folding join keys into a `numBits`-wide bitset.
    * Mergeable (bitwise OR), so it partial-aggregates map-side like any
    * sum; state is a flat long array of numBits/64 words regardless of
    * input rows.
    *
    * Sizing discipline for corpus-sized builds (graph_triangles' closing-
    * edge filter is the shipped example): the CALLER bounds `numBits` —
    * every map-side partial carries the full array through the one-group
    * final exchange, so an unbounded width times a wide cache layout is
    * its own capacity wall. Feed the aggregate through a small
    * `coalesce(k)` so the exchange carries k partials, not one per cache
    * partition.
    */
  final class SizedAgg(val numBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && numBits % 64 == 0,
      s"bloom width must be a positive multiple of 64, got $numBits")
    private val numWords = numBits / 64
    def zero: Array[Long] = new Array[Long](numWords)
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      positions(key, numBits).foreach(p => b(p >> 6) |= 1L << (p & 63))
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numWords) { x(i) |= y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** The fixed-size dim-side build (`join_bloom_prefilter`). */
  val agg: Aggregator[Long, Array[Long], Array[Long]] = new SizedAgg(NumBits)

  /** Probe predicate: true iff every one of `key`'s bit positions is set
    * in `bloom` (an array<bigint> column from [[agg]]). Pure built-in
    * Column arithmetic — stays inside whole-stage codegen, pushable below
    * the probe side's exchange. `call_function("shiftleft", …)` is the
    * variable-distance shift the Scala DSL lacks (its `shiftleft` only
    * takes a literal distance).
    */
  def mightContain(bloom: Column, key: Column,
                   numBits: Int = NumBits): Column = {
    // cast(long): the build side hashes Longs (XXH64.hashLong); Spark's
    // xxhash64 dispatches per input type (hashInt ≠ hashLong for the
    // same value), so an int32 probe column would break the build/probe
    // lockstep and produce FALSE NEGATIVES — silently dropped join rows
    val h = xxhash64(key.cast("long"))
    val g = xxhash64(h) // h is long — same path as the build side
    val base = pmod(h, lit(numBits.toLong))
    val step = pmod(g, lit((numBits - 1).toLong)) + lit(1L)
    (0 until NumHashes).map { i =>
      val pos = pmod(base + lit(i.toLong) * step, lit(numBits.toLong))
        .cast("int")
      val word = element_at(bloom, shiftright(pos, 6) + lit(1))
      val mask = call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63)))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
