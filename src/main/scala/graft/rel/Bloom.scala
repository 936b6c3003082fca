package graft.rel

import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter join pruning (SURVEY §2.B scale tooling): build a
  * compact membership filter over the join keys of a *filtered* dim
  * side and apply it to the fact-table scan BEFORE the shuffle/join,
  * so rows that cannot match never leave the scan stage. The probe is
  * a codegen'd expression ([[graft.functions.GraftExpressions.BloomMightContain]])
  * with one-sided error — false positives are removed by the exact
  * join behind it, so the end result is identical to the unpruned
  * join; the win is shuffle volume, the dominant cost of a fact-side
  * join at 100 TB.
  *
  * The builder here collects the dim keys to the driver — the same
  * bounded-small contract as the IVF centroid collect (dim sides that
  * merit a bloom prune are orders of magnitude smaller than the fact
  * side; ~1 M keys × 16 bits/key = 2 MB of filter). A dim too big to
  * collect would build the identical word array distributed via
  * `treeAggregate` of per-partition filters OR'd together — the probe
  * side is unchanged, so callers can swap builders without replanning.
  *
  * Hashing: two splitmix64 scrambles of the key (h2 forced odd) drive
  * k double-hashed probes h1 + i*h2 mod mBits — deterministic, no RNG
  * state, identical constants in build and probe.
  */
object Bloom {

  private[graft] def scramble(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit positions for `key`: h1 + i*h2 (mod mBits), i in [0, k). */
  private def probe(mBits: Int, k: Int, key: Long)(set: Int => Unit): Unit = {
    val h1 = scramble(key)
    val h2 = scramble(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      set(java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits.toLong).toInt)
      i += 1
    }
  }

  /** Build the word array for `keys` at `bitsPerKey` (m = n*bitsPerKey
    * rounded up to a word; 16 bits/key with k=7 gives ~0.8% FP rate).
    */
  def build(keys: Array[Long], bitsPerKey: Int = 16, k: Int = 7): (Array[Long], Int) = {
    // Long arithmetic: Int n*bitsPerKey overflows past ~134M keys,
    // yielding a negative (or tiny) m — fail loudly instead
    val m = math.max(64L, keys.length.toLong * bitsPerKey)
    require(m <= Int.MaxValue,
      s"bloom filter needs $m bits (${keys.length} keys x $bitsPerKey b/key) > Int.MaxValue; " +
        "lower bitsPerKey or build distributed (treeAggregate of per-partition filters)")
    val mBits = m.toInt
    val words = new Array[Long]((mBits + 63) / 64)
    keys.foreach { key =>
      probe(mBits, k, key)(pos => words(pos >>> 6) |= 1L << (pos & 63))
    }
    (words, mBits)
  }

  /** Membership test against a built filter (interpreted twin of the
    * codegen in BloomMightContain — keep in lockstep).
    */
  def mightContain(words: Array[Long], mBits: Int, k: Int, key: Long): Boolean = {
    var hit = true
    probe(mBits, k, key)(pos => hit &&= (words(pos >>> 6) & (1L << (pos & 63))) != 0L)
    hit
  }

  /** Probe column over a built filter. */
  def mightContainCol(key: Column, words: Array[Long], mBits: Int, k: Int = 7): Column =
    graft.functions.GraftExpressions.bloom_might_contain(key, words, mBits, k)

  /** Collect the (assumed bounded) dim keys and return the fact frame
    * filtered to might-match rows. `dimKeys` must be a single LONG
    * column projection. The bounded-small contract is ENFORCED:
    * collecting stops at maxKeys+1 rows and fails if the dim exceeds
    * it, rather than OOMing the driver — a dim that big should use the
    * distributed treeAggregate builder instead.
    */
  def pruneByKeys(fact: DataFrame, factKey: Column, dimKeys: DataFrame,
      maxKeys: Int = 8 << 20): DataFrame = {
    val keys = dimKeys.limit(maxKeys + 1).collect().map(_.getLong(0))
    require(keys.length <= maxKeys,
      s"pruneByKeys dim side exceeds $maxKeys keys — outside the bounded-collect " +
        "contract; build the filter distributed (treeAggregate of per-partition words)")
    val (words, mBits) = build(keys)
    fact.where(mightContainCol(factKey, words, mBits))
  }
}
