package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the two hot loops the built-in
  * higher-order functions (transform/aggregate/zip_with) execute as
  * interpreted per-element lambdas with boxing. Both are semantically
  * identical to their HOF formulations (same hash function and seed,
  * same fold order) — they exist purely because a fused primitive loop
  * is 1-2 orders of magnitude faster, which at 100 TB is the
  * difference between a dedup pass finishing or not.
  */
object GraftExpressions {

  /** k-permutation MinHash signature of an array<string> shingle set.
    * Permutations are (a_i * h + b_i) mod 2^31-1 over
    * h = xxhash64(shingle, seed 42) folded into [0, 2^31) — identical
    * constants and arithmetic to Dedup.minhashSignature's HOF form.
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {

    private val p = 2147483647L // 2^31 - 1
    private lazy val (as, bs): (Array[Long], Array[Long]) = {
      val a = new Array[Long](k); val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = Math.floorMod(scramble(2 * i + 1), p - 1) + 1
        b(i) = Math.floorMod(scramble(2 * i + 2), p)
        i += 1
      }
      (a, b)
    }

    private def scramble(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sig = new Array[Long](k)
      java.util.Arrays.fill(sig, p)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val h = Math.floorMod(XxHash64Function.hash(s, StringType, 42L), p)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of an array<string> token list: bit j set iff the
    * ±1 sum over tokens of bit j of xxhash64(token) is positive —
    * identical semantics to Dedup.simhash's HOF form, one fused pass.
    */
  case class SimHash(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sums = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (sums(j) > 0) out |= (1L << j); j += 1 }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Word n-gram shingles of a text column: lowercase, trim, split on
    * whitespace, join each n consecutive tokens with a single space —
    * identical output to the HOF form in TextFunctions.shingles (and
    * its DuckDB oracle mirror), fused into one pass. The HOF form
    * re-evaluates the tokenizing split() inside the transform lambda
    * (three element_at calls per shingle), which is quadratic per row.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      // mirror SQL trim exactly: strip ASCII SPACE only (Java's trim
      // also strips \n/\t, which would diverge from tokens()/the
      // DuckDB mirror on whitespace-bracketed text)
      var st = 0
      var en = raw.length
      while (st < en && raw.charAt(st) == ' ') st += 1
      while (en > st && raw.charAt(en - 1) == ' ') en -= 1
      val text = raw.substring(st, en).toLowerCase(java.util.Locale.ROOT)
      // limit -1: keep trailing empty tokens, like Spark's split()
      val toks = text.split("\\s+", -1)
      if (toks.length < n) new GenericArrayData(Array.empty[Any])
      else {
        val out = new Array[Any](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Dot product of two array<float> embeddings in double precision,
    * left-to-right — bit-identical to the zip_with+aggregate fold (and
    * the DuckDB oracle's list_reduce) PROVIDED every partial sum stays
    * below 2^53, where double loses integer exactness. The fixed-point
    * corpora hold the bound with room: 64 dims of ±2^20 components peak
    * at 64·2^40 = 2^46 per dot, and the oracles replay the identical
    * double fold, so a breach would surface as a hash mismatch rather
    * than silent drift. Raising the fixed point past 2^23 or dims past
    * ~512 needs a long accumulator (or a re-derived oracle) — the
    * exactness claim is conditional, not unconditional.
    *
    * Unlike the other expressions here, this one generates real Java
    * (doGenCode): it sits inside the whole-stage-codegen'd brute-force
    * scoring loop where a fallback would break the codegen span three
    * times per candidate pair (dot, |a|, |b|).
    */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    private def reader(t: DataType): (ArrayData, Int) => Double = {
      val et = t.asInstanceOf[ArrayType].elementType
      et match {
        case FloatType  => (a, i) => a.getFloat(i).toDouble
        case DoubleType => (a, i) => a.getDouble(i)
        case LongType   => (a, i) => a.getLong(i).toDouble
        case IntegerType => (a, i) => a.getInt(i).toDouble
        case other => throw new IllegalArgumentException(s"vec_dot: unsupported element type $other")
      }
    }
    @transient private lazy val readL = reader(left.dataType)
    @transient private lazy val readR = reader(right.dataType)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += readL(x, i) * readR(y, i)
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    private def javaGet(et: DataType, arr: String, i: String): String = et match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case other => throw new IllegalArgumentException(s"vec_dot: unsupported element type $other")
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val lt = left.dataType.asInstanceOf[ArrayType].elementType
        val rt = right.dataType.asInstanceOf[ArrayType].elementType
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${javaGet(lt, a, i)} * ${javaGet(rt, b, i)};
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Bloom-filter membership probe over a LONG key against a
    * pre-built, broadcast-as-literal bit array (see [[graft.rel.Bloom]]
    * for the builder and the deterministic double-hashing scheme —
    * probe and build MUST share it bit for bit).
    *
    * Generates real Java (doGenCode): the probe sits directly on the
    * fact-table scan as a pre-join prune, the hottest row path there
    * is — a codegen fallback would break the scan's whole-stage span.
    * One-sided error: may pass a non-member (the exact join behind it
    * removes those), never drops a member.
    */
  case class BloomMightContain(child: Expression, words: Array[Long], mBits: Int, k: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

    // pin the key to LongType at analysis time: nullSafeEval casts to
    // Long, so an un-coerced Int key would CCE on the interpreted path
    // while codegen silently widens — the two paths must agree
    override def inputTypes = Seq(LongType) // AbstractDataType is private[sql]

    override def dataType: DataType = BooleanType

    override def nullSafeEval(input: Any): Any = {
      val key = input.asInstanceOf[Long]
      java.lang.Boolean.valueOf(graft.rel.Bloom.mightContain(words, mBits, k, key))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, key => {
        val h1 = ctx.freshName("h1")
        val h2 = ctx.freshName("h2")
        val pos = ctx.freshName("pos")
        val hit = ctx.freshName("hit")
        val i = ctx.freshName("i")
        // inline splitmix64 twice; h2 forced odd so the k probe strides
        // cover the bit space (matches Bloom.scramble exactly)
        s"""
           |long $h1 = $key + 0x9e3779b97f4a7c15L;
           |$h1 = ($h1 ^ ($h1 >>> 30)) * 0xbf58476d1ce4e5b9L;
           |$h1 = ($h1 ^ ($h1 >>> 27)) * 0x94d049bb133111ebL;
           |$h1 = $h1 ^ ($h1 >>> 31);
           |long $h2 = ($key ^ 0x5851f42d4c957f2dL) + 0x9e3779b97f4a7c15L;
           |$h2 = ($h2 ^ ($h2 >>> 30)) * 0xbf58476d1ce4e5b9L;
           |$h2 = ($h2 ^ ($h2 >>> 27)) * 0x94d049bb133111ebL;
           |$h2 = ($h2 ^ ($h2 >>> 31)) | 1L;
           |boolean $hit = true;
           |for (int $i = 0; $i < $k && $hit; $i++) {
           |  int $pos = (int) java.lang.Long.remainderUnsigned($h1 + (long) $i * $h2, (long) $mBits);
           |  $hit = ($ref[$pos >>> 6] & (1L << ($pos & 63))) != 0L;
           |}
           |${ev.value} = $hit;
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Exact (d2, cand) argmin as a HASH-aggregable aggregate: returns
    * the `cand` of the lexicographically smallest (d2, cand) pair.
    *
    * Exists because neither built-in formulation survives the hot
    * path: `min(struct(d2, cand))` has no mutable buffer so Spark
    * plans SortAggregate — a full sort of the n×nlist assignment
    * fan-out with interpreted struct comparators — and packing into
    * Decimal(38,0) is hash-aggregable but precision > 18 rides
    * java.math.BigDecimal, an allocation per fanned-out row (~4 µs/
    * pair measured at gen10's 4×10⁸ pairs). This is a
    * DeclarativeAggregate over a TWO-LONG mutable buffer — pure
    * codegen'd long compares, HashAggregate-eligible, no value-range
    * packing bound at any nlist.
    *
    * NULL-input rows are ignored (SQL aggregate semantics); an empty
    * group evaluates to NULL via the MaxValue sentinel, so a genuine
    * (Long.MaxValue, Long.MaxValue) input is indistinguishable from
    * absence — fine here, d2 is structurally < 2^53.
    *
    * NULL divergence vs the `min(struct(d2, cand))` it replaced:
    * struct ordering sorts a NULL d2 field FIRST, so the struct form
    * could return a null-d2 row's cand while this aggregate skips
    * null rows entirely. Every call site produces a structurally
    * non-null d2 (a squared distance over non-null vectors), so the
    * two agree today — but a future fan-out that manufactures null
    * distances would silently change winners; keep d2 non-null at the
    * call boundary (hashArgmin's contract).
    */
  case class ArgMinLong(d2: Expression, cand: Expression)
      extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {
    import org.apache.spark.sql.catalyst.expressions._

    // reject non-long inputs at ANALYSIS time: the buffer-vs-input
    // compare expressions below are built over LongType attributes, so
    // e.g. an int d2 would otherwise fail obscurely at physical
    // planning/codegen instead of with a clean type error
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (d2.dataType == LongType && cand.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"arg_min_long requires (BIGINT, BIGINT) inputs, got " +
          s"(${d2.dataType.simpleString}, ${cand.dataType.simpleString})")
    }
    override def children: Seq[Expression] = Seq(d2, cand)
    override def nullable: Boolean = true
    override def dataType: DataType = LongType
    override def prettyName: String = "arg_min_long"

    private lazy val bd = AttributeReference("bd", LongType, nullable = false)()
    private lazy val bc = AttributeReference("bc", LongType, nullable = false)()
    override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bd, bc)
    override lazy val initialValues: Seq[Expression] =
      Seq(Literal(Long.MaxValue), Literal(Long.MaxValue))
    override lazy val updateExpressions: Seq[Expression] = {
      val keepBuffer = Or(Or(IsNull(d2), IsNull(cand)),
        Or(LessThan(bd, d2), And(EqualTo(bd, d2), LessThanOrEqual(bc, cand))))
      Seq(If(keepBuffer, bd, d2), If(keepBuffer, bc, cand))
    }
    override lazy val mergeExpressions: Seq[Expression] = {
      val keepLeft = Or(LessThan(bd.left, bd.right),
        And(EqualTo(bd.left, bd.right), LessThanOrEqual(bc.left, bc.right)))
      Seq(If(keepLeft, bd.left, bd.right), If(keepLeft, bc.left, bc.right))
    }
    override lazy val evaluateExpression: Expression =
      If(And(EqualTo(bd, Literal(Long.MaxValue)),
          EqualTo(bc, Literal(Long.MaxValue))),
        Literal(null, LongType), bc)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(d2 = newChildren(0), cand = newChildren(1))
  }

  /** All ordered pairs (x_i, x_j), i < j, of a sorted LONG array, each
    * packed into ONE long as `(x_i << 32) | x_j` — the codegen'd pair
    * expansion behind the collect_set pair-explode rewrites (r18).
    *
    * Exists because the HOF spelling
    * (`flatten(transform(…, slice(…)))`) runs its lambdas INTERPRETED:
    * at the triangle family's ≤ 7-element sets that is measurable
    * overhead per order row, and at common-neighbors' ≤ 200-element
    * sets (~20k structs through the interpreted path per hot
    * customer) it lost to the whole-stage-codegen'd self-join
    * outright (the r18 revert). This expression emits the packed
    * pair array inside whole-stage codegen — one allocation, two
    * primitive loops — and the builtin `explode` + shift/mask unpack
    * keep the entire fan-out in the codegen span, so the
    * join-elimination rewrite no longer pays an interpretation tax.
    *
    * Packing contract: elements must lie in [0, 2^31) — suppkeys and
    * custkeys are 32-bit TPC-H identities at every SF (int32 in the
    * spec; int64 only as a storage type), so (hi << 32 | lo) is
    * lossless and the unpack is `pk >>> 32` / `pk & 0xFFFFFFFF`.
    * Violations THROW (both paths) rather than corrupt pairs. The
    * input must be sorted ascending and duplicate-free (collect_set +
    * sort_array), which makes hi < lo for every pair; the expression
    * itself does not re-check sortedness — it would cost a pass and
    * both call sites feed it sort_array output directly.
    */
  case class PackedPairs(child: Expression)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "packed_pairs"

    // r19 contract hardening (ADVICE): the pair count is computed in
    // LONG and guarded — at n >= ~46341 the old int expression
    // n*(n-1)/2 overflowed into a NegativeArraySizeException or a
    // wrong-sized allocation — and a null array slot throws the
    // contract error instead of reading garbage through getLong.
    private def pairCount(n: Int): Int = {
      val sz = n.toLong * (n - 1) / 2
      if (sz > Int.MaxValue)
        throw new IllegalArgumentException(
          s"packed_pairs: $n elements imply $sz pairs, past Int.MaxValue")
      sz.toInt
    }

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new Array[Long](pairCount(n))
      var k = 0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i))
          throw new IllegalArgumentException(
            s"packed_pairs: null element at index $i")
        val x = a.getLong(i)
        if (x < 0L || x > 0x7FFFFFFFL)
          throw new IllegalArgumentException(
            s"packed_pairs: element $x outside [0, 2^31)")
        val hi = x << 32
        var j = i + 1
        while (j < n) { out(k) = hi | a.getLong(j); k += 1; j += 1 }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val hi = ctx.freshName("hi")
        val szL = ctx.freshName("szL")
        s"""
           |int $n = $a.numElements();
           |long $szL = (long) $n * ($n - 1) / 2;
           |if ($szL > Integer.MAX_VALUE)
           |  throw new IllegalArgumentException(
           |    "packed_pairs: " + $n + " elements imply " + $szL +
           |    " pairs, past Int.MaxValue");
           |long[] $out = new long[(int) $szL];
           |int $k = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i))
           |    throw new IllegalArgumentException(
           |      "packed_pairs: null element at index " + $i);
           |  long $x = $a.getLong($i);
           |  if ($x < 0L || $x > 0x7FFFFFFFL)
           |    throw new IllegalArgumentException(
           |      "packed_pairs: element " + $x + " outside [0, 2^31)");
           |  long $hi = $x << 32;
           |  for (int $j = $i + 1; $j < $n; $j++) {
           |    $out[$k++] = $hi | $a.getLong($j);
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---- Column wrappers (classic-API bridge: Spark 4 moved
  // Column<->Expression conversion to sql.classic.ExpressionUtils) ----

  private def ex(c: Column) = org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def co(e: Expression) = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def minhash_sig(c: Column, k: Int): Column = co(MinHashSig(ex(c), k))
  def word_shingles(c: Column, n: Int): Column = co(WordShingles(ex(c), n))
  def simhash64(c: Column): Column = co(SimHash(ex(c)))
  def vec_dot(a: Column, b: Column): Column = co(VecDot(ex(a), ex(b)))
  def packed_pairs(c: Column): Column = co(PackedPairs(ex(c)))
  def arg_min_long(d2: Column, cand: Column): Column =
    co(ArgMinLong(ex(d2), ex(cand)).toAggregateExpression())
  def bloom_might_contain(key: Column, words: Array[Long], mBits: Int, k: Int): Column =
    co(BloomMightContain(ex(key), words, mBits, k))
}
