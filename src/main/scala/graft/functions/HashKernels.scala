package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Codegen'd sketch kernels over pre-hashed shingle arrays (`array<long>`).
  *
  * Why these exist: the declarative forms (k× `array_min(transform(...))`,
  * per-bit `filter(...)`) are correct but evaluate higher-order lambdas
  * interpreted, and Catalyst does NOT share the md5 base-hash subtree
  * across the k permutation branches after project-collapse — measured
  * 50-100s per dedup query at sf0.1. Each kernel takes the hash array
  * (md5 computed ONCE per shingle upstream) and runs a compiled loop.
  * Outputs are bit-identical to the declarative forms they replace, so the
  * DuckDB oracles are untouched.
  */

/** k-permutation MinHash over raw 60-bit base hashes:
  * sig[i] = min over x of (a_i·(x%p) + b_i) % p, sentinel p on empty
  * input. The reduction happens inside the loop so callers pass the
  * ShingleHashesExpr output directly; a·(x%p) < 2^52, overflow-free. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(graft.operators.Dedup.minhashA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(graft.operators.Dedup.minhashB)
  private def p: Long = graft.operators.Dedup.MinhashP

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = Array.fill(k)(p)
    var j = 0
    while (j < n) {
      val x = xs.getLong(j) % p
      var i = 0
      while (i < k) {
        val h = (as(i) * x + bs(i)) % p
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    // freshName: fixed locals collide when several kernels share a codegen
    // scope — Janino rejects the class and Spark falls back to interpreted.
    val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val x = ctx.freshName("x"); val h = ctx.freshName("h")
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |int $n = $xs.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${p}L);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $xs.getLong($j) % ${p}L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = ($aRef[$i] * $x + $bRef[$i]) % ${p}L;
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** SimHash over raw 60-bit hashes: bit i set iff 2·|{h: bit i set}| > n. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = xs.getLong(j)
      var i = 0
      while (i < bits) {
        if (((h >> i) & 1L) == 1L) cnt(i) += 1
        i += 1
      }
      j += 1
    }
    var v = 0L
    var i = 0
    while (i < bits) {
      if (2 * cnt(i) > n) v |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(v)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val h = ctx.freshName("h"); val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, xs => {
      s"""
         |int $n = $xs.numElements();
         |int[] $cnt = new int[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $xs.getLong($j);
         |  for (int $i = 0; $i < $bits; $i++) {
         |    if ((($h >> $i) & 1L) == 1L) $cnt[$i]++;
         |  }
         |}
         |long $v = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if (2 * $cnt[$i] > $n) $v |= (1L << $i);
         |}
         |${ev.value} = $v;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}

/** Merge-count of common elements between two SORTED long arrays with
  * distinct elements — allocation-free replacement for
  * `size(array_intersect(a, b))` in the pair-verification hot loop. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count expects two array<bigint> inputs")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val c = ctx.freshName("c"); val an = ctx.freshName("an")
    val bn = ctx.freshName("bn")
    val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $an = $a.numElements(), $bn = $b.numElements();
         |while ($i < $an && $j < $bn) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Fused normalize → tokenize → n-gram → md5 → 60-bit-long pipeline in one
  * compiled pass per row.
  *
  * The declarative chain (`transform(sequence(...), i => concat_ws(...,
  * element_at(tokens(text), i+k)))`) is quadratic in practice: higher-order
  * lambdas are interpreted, and each `element_at` in the lambda body
  * re-evaluates the ENTIRE tokens() subtree — lower + regexp_replace +
  * trim + split — once per gram per position (~156 regex passes per
  * 50-token doc; measured 23s for 5000 docs, doubled again by filter
  * pushdown recomputing the expression under `size(sh) > 0`). This kernel
  * runs the whole thing once per row.
  *
  * Bit-compat with the DuckDB oracle (`DedupQueries.shView`/`baseHashSql`):
  * lowercase → `\s+`→' ' → trim → split(' ') → distinct word n-grams →
  * md5 hex → first 15 hex digits parsed base-16 (60-bit long). Inputs are
  * ASCII synthetic text; Java `Locale.ROOT` lowercase, Java regex `\s`,
  * and DuckDB RE2 `\s` agree on ASCII. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.compute(input.toString, n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = ShingleHashesExpr.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($s.toString(), $n);"
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

object ShingleHashesExpr {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  // one digest per executor thread — getInstance() does a provider
  // lookup + allocation, and this runs once per ROW in the hottest
  // dedup path
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: String, n: Int): GenericArrayData = {
    val norm = ws.matcher(text.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ").trim
    if (norm.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val toks = norm.split(' ')
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = md5.get()
    val seen = new java.util.HashSet[String]()
    val maxGrams = toks.length - n + 1
    val out = new Array[Long](maxGrams) // primitive accumulator, no boxing
    var m = 0
    var i = 0
    while (i < maxGrams) {
      val sb = new java.lang.StringBuilder(64)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k)); k += 1
      }
      val gram = sb.toString
      if (seen.add(gram)) {
        md.reset()
        val dig = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex digits of the md5 = top 7.5 bytes, as a 60-bit long
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        h = (h << 4) | ((dig(7) >> 4) & 0xfL)
        out(m) = h; m += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (m == maxGrams) out else java.util.Arrays.copyOf(out, m))
  }
}

/** 16-bin byte-class histogram of a binary payload — a REAL content
  * feature (byte-range distribution: control / digit / upper / lower /
  * high-bit classes — the content-type & entropy signal media routers
  * compute before any decode). Bin = (byte & 0xff) >> 4; counts as
  * `array<bigint>`. One compiled pass over the payload bytes, same
  * static-compute codegen shape as [[ShingleHashesExpr]]. */
case class ByteHistogramExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"byte_histogram expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ByteHistogramExpr.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val cls = ByteHistogramExpr.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($b);"
    })

  override protected def withNewChildInternal(c: Expression): ByteHistogramExpr =
    copy(child = c)
}

object ByteHistogramExpr {
  def compute(bytes: Array[Byte]): GenericArrayData = {
    val cnt = new Array[Long](16)
    var i = 0
    while (i < bytes.length) { cnt((bytes(i) & 0xff) >> 4) += 1; i += 1 }
    new GenericArrayData(cnt)
  }
}

/** Number of leading equal CHARACTERS of two strings — the codegen
  * replacement for SuffixArray.repeatSpans' interpreted
  * `array_min(transform(sequence(1, cap), i -> ...))` LCP scan (round
  * 17, optimization): the higher-order form evaluates interpreted and
  * re-walks `substring(s, i, 1)` from the string head per element —
  * O(cap²) byte traversals per pair — where one compiled byte loop is
  * O(prefix). Bit-identical to the declarative mismatch formula: for
  * capped inputs, `lcp = common_prefix_chars(sa, sb)` equals
  * `CASE WHEN m = cap+1 THEN least(length(sa), length(sb)) ELSE m-1`
  * for every case (diff at char d → both give d−1; one a prefix of the
  * other → mismatch at minLen+1 → minLen = the common prefix; equal →
  * m = cap+1 → least(len) = the common prefix). UTF-8-aware: counts
  * only COMPLETE chars inside the matching byte prefix (first bytes
  * encode their sequence length, so equal byte prefixes never split a
  * char boundary inconsistently); on the suffix-array family's
  * enforced printable-ASCII corpus bytes == chars anyway. */
case class CommonPrefixCharsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_chars expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixCharsExpr.compute(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CommonPrefixCharsExpr.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CommonPrefixCharsExpr =
    copy(left = l, right = r)
}

object CommonPrefixCharsExpr {
  def compute(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Int = {
    val ab = a.getBytes; val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // count the complete chars wholly inside the matching prefix [0, i)
    var j = 0; var chars = 0
    while (j < i) {
      val nb = org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(ab(j))
      if (j + nb <= i) { chars += 1; j += nb } else j = i
    }
    chars
  }
}

object HashKernels {
  /** Leading equal CHARACTER count of two strings (the compiled LCP
    * kernel). PRECONDITION (r17 ADVICE): the kernel is cap-agnostic —
    * it counts the full common prefix of whatever it is given.
    * Equivalence to a cap-bounded mismatch formula (the repeatSpans /
    * oracle form) holds only because callers pre-cap both inputs with
    * `substring(s, pos, cap)`; an uncapped caller gets the uncapped
    * LCP. */
  def commonPrefixChars(a: Column, b: Column): Column =
    ColumnShim.column(CommonPrefixCharsExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def byteHistogram(p: Column): Column =
    ColumnShim.column(ByteHistogramExpr(ColumnShim.expression(p)))
  def shingleHashes(text: Column, n: Int): Column =
    ColumnShim.column(ShingleHashesExpr(ColumnShim.expression(text), n))
  def minhashSig(xh: Column, k: Int): Column =
    ColumnShim.column(MinHashSigExpr(ColumnShim.expression(xh), k))
  def simhashOf(xh: Column, bits: Int): Column =
    ColumnShim.column(SimHashExpr(ColumnShim.expression(xh), bits))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
