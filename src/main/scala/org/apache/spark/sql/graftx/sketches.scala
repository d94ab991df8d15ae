/* Mergeable sketch aggregates for graft.
 *
 * The 100 TB profiling pattern is sketch-once / re-aggregate-cheaply:
 * build a constant-memory mergeable summary per partition (or per
 * day/source in a lake), ship ONLY the summaries through the shuffle,
 * and union stored summaries later without touching raw data again.
 * These are native Catalyst `TypedImperativeAggregate`s, so Spark's
 * partial-aggregation machinery (map-side update → serialized buffer →
 * reduce-side merge) applies automatically.
 *
 * All algorithms are implemented from their published descriptions:
 *  - HyperLogLog: Flajolet et al., "HyperLogLog: the analysis of a
 *    near-optimal cardinality estimation algorithm" (AofA 2007).
 *  - KLL: Karnin, Lang, Liberty, "Optimal quantile approximation in
 *    streams" (FOCS 2016).
 *  - SpaceSaving: Metwally, Agrawal, El Abbadi, "Efficient computation
 *    of frequent and top-k elements in data streams" (ICDT 2005);
 *    merge per Agarwal et al., "Mergeable summaries" (PODS 2012).
 */
package org.apache.spark.sql.graftx

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared HLL register math (dense representation: 2^p byte registers). */
object Hll {
  val Seed = 0x9747b28cL

  def emptyRegs(p: Int): Array[Byte] = new Array[Byte](1 << p)

  /** Fold one 64-bit hash into the register array. */
  def add(regs: Array[Byte], p: Int, h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    // rank of the first set bit among the remaining 64-p bits, 1-based;
    // all-zero rest saturates at (64-p)+1
    val rank = (math.min(java.lang.Long.numberOfLeadingZeros(rest), 64 - p) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"hll_union: mismatched sketch precision (${a.length} vs ${b.length} registers)")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Standard HLL estimator with the linear-counting small-range
    * correction. (No large-range correction: with a 64-bit hash the
    * collision regime is beyond any realistic cardinality.)
    */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i)
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    var e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) e = m * math.log(m.toDouble / zeros)
    math.round(e)
  }

  /** Wire format: [p: byte][registers: 2^p bytes]. */
  def serialize(regs: Array[Byte]): Array[Byte] = {
    val p = java.lang.Integer.numberOfTrailingZeros(regs.length)
    val out = new Array[Byte](1 + regs.length)
    out(0) = p.toByte
    System.arraycopy(regs, 0, out, 1, regs.length)
    out
  }

  def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val p = bytes(0).toInt
    require(bytes.length == 1 + (1 << p), s"hll: corrupt sketch (${bytes.length} bytes, p=$p)")
    java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
  }
}

/** Aggregate: build a dense HLL sketch (BinaryType) over any column.
  * Precision p in [4, 18]; standard error ≈ 1.04/sqrt(2^p)
  * (p=12 → 1.6 %). Null inputs are skipped, like count(DISTINCT).
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 18, s"hll_sketch: precision $p outside [4, 18]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegs(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, p, XxHash64Function.hash(v, child.dataType, Hll.Seed))
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)

  override def eval(buf: Array[Byte]): Any = Hll.serialize(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = Hll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Byte] = Hll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_sketch"
}

/** Aggregate: union stored HLL sketches (BinaryType → BinaryType) —
  * the re-aggregation half of sketch-once/union-later. All inputs must
  * share one precision.
  */
case class HllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // empty marker until the first sketch fixes the precision
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val regs = Hll.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf.isEmpty) regs else Hll.merge(buf, regs)
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else Hll.merge(a, b)

  override def eval(buf: Array[Byte]): Any =
    Hll.serialize(if (buf.isEmpty) Hll.emptyRegs(12) else buf)

  override def serialize(buf: Array[Byte]): Array[Byte] =
    if (buf.isEmpty) buf else Hll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Byte] =
    if (bytes.isEmpty) bytes else Hll.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllUnionAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_union"
}

/** Scalar: read the cardinality estimate out of a serialized HLL sketch. */
case class HllEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    Hll.estimate(Hll.deserialize(v.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): HllEstimateExpr =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

/** KLL sketch state: a ladder of weighted buffers. Items at level h
  * carry weight 2^h; compaction sorts a full level, promotes every
  * other element (alternating offset), and discards the counterparts.
  */
final class KllBuf(val k: Int) {
  var n: Long = 0L
  var flip: Int = 0
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])

  private def capacity(h: Int): Int = {
    val fromTop = levels.length - 1 - h
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, fromTop)).toInt)
  }

  private def totalCapacity: Int = levels.indices.map(capacity).sum
  private def totalSize: Int = levels.map(_.length).sum

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (totalSize > totalCapacity) compress()
  }

  def mergeIn(other: KllBuf): Unit = {
    while (levels.length < other.levels.length)
      levels += mutable.ArrayBuffer.empty[Double]
    var h = 0
    while (h < other.levels.length) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    n += other.n
    while (totalSize > totalCapacity) compress()
  }

  /** Compact the lowest over-full level. Callers only invoke this while
    * totalSize > totalCapacity, which guarantees some level exceeds its
    * own capacity (>= 8 >= 2 items), so `find` always succeeds and each
    * call strictly shrinks totalSize — the mergeIn loop terminates.
    */
  private def compress(): Unit = {
    val h = levels.indices.find(i => levels(i).length > capacity(i)).get
    val buf = levels(h)
    val sorted = buf.sorted
    if (h + 1 >= levels.length) levels += mutable.ArrayBuffer.empty[Double]
    val keepOdd = sorted.length % 2 == 1
    // an odd leftover stays at level h with its own weight — no bias
    val retained = if (keepOdd) mutable.ArrayBuffer(sorted.head) else mutable.ArrayBuffer.empty[Double]
    val start = (if (keepOdd) 1 else 0) + flip
    flip ^= 1
    var i = start
    while (i < sorted.length) {
      levels(h + 1) += sorted(i)
      i += 2
    }
    levels(h) = retained
  }

  /** The sketch's weighted sample flattened for CDF evaluation:
    * (values ascending, cumulative weight fraction at each value).
    * `cdf(v)` = fraction at the rightmost value <= v. Exact whenever no
    * compaction has happened (n below capacity).
    */
  def weightedCdf(): (Array[Double], Array[Double]) = {
    require(n > 0, "kll: empty sketch")
    val weighted = levels.zipWithIndex.flatMap { case (l, h) =>
      l.map(v => (v, (1L << h).toDouble))
    }.sortBy(_._1)
    val values = weighted.map(_._1).toArray
    val total = weighted.iterator.map(_._2).sum
    val cdf = weighted.scanLeft(0.0)(_ + _._2).tail.map(_ / total).toArray
    (values, cdf)
  }

  /** Lower-quantile estimate at probability `prob`. */
  def quantile(prob: Double): Double = {
    require(n > 0, "kll: empty sketch")
    val weighted = mutable.ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => weighted += ((v, w)))
      h += 1
    }
    val sorted = weighted.sortBy(_._1)
    val totalW = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(prob * totalW).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(flip); out.writeLong(n)
    out.writeInt(levels.length)
    levels.foreach { l =>
      out.writeInt(l.length)
      l.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllBuf {
  def deserialize(bytes: Array[Byte]): KllBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuf(in.readInt())
    buf.flip = in.readInt()
    buf.n = in.readLong()
    val nLevels = in.readInt()
    buf.levels.clear()
    (0 until nLevels).foreach { _ =>
      val sz = in.readInt()
      val l = new mutable.ArrayBuffer[Double](sz)
      (0 until sz).foreach(_ => l += in.readDouble())
      buf.levels += l
    }
    buf
  }
}

/** Aggregate: KLL quantile estimates for a double column at the given
  * probabilities. k=200 → ~1.7 % two-sided normalized rank error.
  * Returns array<double> aligned with `probabilities`; null inputs are
  * skipped; an all-null group returns null.
  */
case class KllQuantileAgg(
    child: Expression,
    probabilities: Seq[Double],
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] with ExpectsInputTypes {

  require(probabilities.nonEmpty && probabilities.forall(q => q >= 0 && q <= 1),
    "kll_quantiles: probabilities must be in [0, 1]")
  require(k >= 8, s"kll_quantiles: k=$k too small")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf = { a.mergeIn(b); a }

  override def eval(buf: KllBuf): Any =
    if (buf.n == 0) null
    else new GenericArrayData(probabilities.map(buf.quantile).toArray)

  override def serialize(buf: KllBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllQuantileAgg =
    copy(child = c.head)
  override def prettyName: String = "kll_quantiles"
}

/** Aggregate: KLL sketch in its serialized form (BinaryType) — the
  * storable artifact; read quantiles later with [[KllQuantilesOfExpr]]
  * or merge stored sketches with [[KllMergeAgg]].
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] with ExpectsInputTypes {

  require(k >= 8, s"kll_sketch: k=$k too small")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)
  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = { a.mergeIn(b); a }
  override def eval(buf: KllBuf): Any = buf.serialize()
  override def serialize(buf: KllBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "kll_sketch"
}

/** Aggregate: merge STORED KLL sketches (BinaryType → BinaryType). The
  * first non-empty sketch fixes the working capacity. Null inputs and
  * empty sketches are skipped.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // n == 0 marks the not-yet-initialized sentinel
  override def createAggregationBuffer(): KllBuf = new KllBuf(200)

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = KllBuf.deserialize(v.asInstanceOf[Array[Byte]])
      if (in.n == 0) buf
      else if (buf.n == 0) in
      else { buf.mergeIn(in); buf }
    }
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf =
    if (a.n == 0) b else if (b.n == 0) a else { a.mergeIn(b); a }
  override def eval(buf: KllBuf): Any = buf.serialize()
  override def serialize(buf: KllBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c.head)
  override def prettyName: String = "kll_merge"
}

/** Scalar: quantile estimates out of a serialized KLL sketch; null for
  * an empty sketch.
  */
case class KllQuantilesOfExpr(child: Expression, probabilities: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  require(probabilities.nonEmpty && probabilities.forall(q => q >= 0 && q <= 1),
    "kll_quantiles_of: probabilities must be in [0, 1]")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val buf = KllBuf.deserialize(v.asInstanceOf[Array[Byte]])
    if (buf.n == 0) null
    else new GenericArrayData(probabilities.map(buf.quantile).toArray)
  }
  override protected def withNewChildInternal(c: Expression): KllQuantilesOfExpr =
    copy(child = c)
  override def prettyName: String = "kll_quantiles_of"
}

/** SpaceSaving counter table. Capacity k; eviction replaces the
  * minimum-count entry and inherits its count as the error bound.
  */
final class SpaceSavingBuf(val k: Int) {
  // item -> (estimated count, max overestimate)
  val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def update(item: String): Unit = {
    counters.get(item) match {
      case Some((c, e)) => counters(item) = (c + 1, e)
      case None if counters.size < k => counters(item) = (1L, 0L)
      case None =>
        // O(k) min scan — k is small (≤ a few thousand); ties broken
        // by item order for determinism
        val (minItem, (minC, _)) =
          counters.minBy { case (it, (c, _)) => (c, it) }
        counters.remove(minItem)
        counters(item) = (minC + 1, minC)
    }
  }

  def mergeIn(other: SpaceSavingBuf): Unit = {
    other.counters.foreach { case (it, (c, e)) =>
      counters.get(it) match {
        case Some((c0, e0)) => counters(it) = (c0 + c, e0 + e)
        case None => counters(it) = (c, e)
      }
    }
    if (counters.size > k) {
      val keep = counters.toSeq
        .sortBy { case (it, (c, _)) => (-c, it) }
        .take(k)
      counters.clear()
      counters ++= keep
    }
  }

  /** (item, count, err) sorted by count desc, item asc. */
  def result: Seq[(String, Long, Long)] =
    counters.toSeq
      .sortBy { case (it, (c, _)) => (-c, it) }
      .map { case (it, (c, e)) => (it, c, e) }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(counters.size)
    counters.foreach { case (it, (c, e)) =>
      val b = it.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSavingBuf {
  def deserialize(bytes: Array[Byte]): SpaceSavingBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuf(in.readInt())
    val sz = in.readInt()
    (0 until sz).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counters(new String(b, "UTF-8")) = (in.readLong(), in.readLong())
    }
    buf
  }
}

/** Aggregate: SpaceSaving heavy hitters over a string column. Returns
  * array<struct<item, count, err>> (count desc). Guarantees: every item
  * with true frequency > n/k is present; counts overestimate by at most
  * `err` ≤ n/k. With k larger than the true distinct count the table
  * never evicts and counts are exact.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] with ExpectsInputTypes {

  require(k >= 1, s"heavy_hitters: k=$k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf(k)

  override def update(buf: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    a.mergeIn(b); a
  }

  override def eval(buf: SpaceSavingBuf): Any =
    new GenericArrayData(buf.result.map { case (it, c, e) =>
      InternalRow(UTF8String.fromString(it), c, e)
    }.toArray)

  override def serialize(buf: SpaceSavingBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf =
    SpaceSavingBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = c.head)
  override def prettyName: String = "heavy_hitters"
}

/** KMV (k-minimum-values / bottom-k) distinct-value sketch: keep the k
  * smallest 64-bit hashes of the distinct values. Unlike HLL it
  * supports SET OPERATIONS: the union of two sketches is merge+trim,
  * and Jaccard/intersection estimate from the overlap within the
  * combined sketch's k smallest values — the corpus-overlap question
  * ("how much of crawl B is already in A?") HLL cannot answer.
  * Below capacity the sketch holds every distinct hash, so estimates
  * are exact (modulo 64-bit hash collisions).
  *
  * Estimators (Beyer et al., "On synopses for distinct-value
  * estimation under multiset operations", SIGMOD 2007):
  *   distinct  ≈ (k-1) * 2^64 / kthMinValue   (when full)
  *   jaccard(A,B) ≈ |K(A∪B) ∩ A ∩ B| / k      (K = k smallest of union)
  */
object Kmv {
  /** Buffer: sorted long set capped at k (unsigned hash order). */
  final class Buf(val k: Int) {
    val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet(
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    def add(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last.longValue) < 0) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }
    def mergeIn(o: Buf): Unit = {
      val it = o.set.iterator()
      while (it.hasNext) add(it.next().longValue)
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.set.size)
    b.set.forEach(h => out.writeLong(h))
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new Buf(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => b.set.add(in.readLong()))
    b
  }

  /** Distinct-count estimate from a serialized sketch. */
  def estimate(bytes: Array[Byte]): Long = {
    val b = deserialize(bytes)
    val n = b.set.size
    if (n < b.k) n.toLong
    else {
      // unsigned kth-min as a fraction of the 2^64 hash space
      val kth = b.set.last.longValue()
      val u = (kth >>> 1).toDouble * 2.0 + (kth & 1L)
      val frac = math.max(u / 1.8446744073709552e19, Double.MinPositiveValue)
      math.round((b.k - 1) / frac)
    }
  }

  /** (jaccard, union-distinct estimate) from one union build. */
  private def overlap(a: Array[Byte], b: Array[Byte]): (Double, Long) = {
    val ba = deserialize(a); val bb = deserialize(b)
    require(ba.k == bb.k, s"kmv: mismatched k (${ba.k} vs ${bb.k})")
    val union = new Buf(ba.k)
    union.mergeIn(ba); union.mergeIn(bb)
    if (union.set.isEmpty) return (0.0, 0L)
    var both = 0
    var n = 0
    val it = union.set.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (ba.set.contains(h) && bb.set.contains(h)) both += 1
      n += 1
    }
    (both.toDouble / n, estimate(serialize(union)))
  }

  /** Jaccard estimate of the two underlying sets. */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = overlap(a, b)._1

  /** Intersection-size estimate: jaccard x union-distinct estimate. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val (j, u) = overlap(a, b)
    math.round(j * u)
  }

  /** Containment estimate |A∩B| / |A| in ONE overlap pass (one
    * deserialize of each sketch, one union build) — the asymmetric
    * overlap Jaccard misses. 0.0 for an empty A.
    */
  def containment(a: Array[Byte], b: Array[Byte]): Double = {
    val (j, u) = overlap(a, b)
    val inter = math.round(j * u)
    val estA = estimate(a)
    // clamp: above capacity inter and estA are independent noisy
    // estimators, and a subset A can otherwise read as >100% contained
    if (estA == 0L) 0.0 else math.min(1.0, inter.toDouble / estA)
  }
}

/** Aggregate: build a KMV bottom-k sketch (BinaryType) over any column. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buf] {

  require(k >= 16 && k <= (1 << 20), s"kmv_sketch: k=$k outside [16, 1M]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf(k)

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.add(XxHash64Function.hash(v, child.dataType, Hll.Seed))
    buf
  }

  override def merge(a: Kmv.Buf, b: Kmv.Buf): Kmv.Buf = { a.mergeIn(b); a }

  override def eval(buf: Kmv.Buf): Any = Kmv.serialize(buf)
  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "kmv_sketch"
}

/** Scalar readers over serialized KMV sketches. */
case class KmvEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Kmv.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): KmvEstimateExpr =
    copy(child = c)
  override def prettyName: String = "kmv_estimate"
}

case class KmvJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kmv.jaccard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvJaccardExpr = copy(left = l, right = r)
  override def prettyName: String = "kmv_jaccard"
}

case class KmvIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kmv.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersectExpr = copy(left = l, right = r)
  override def prettyName: String = "kmv_intersect"
}

case class KmvContainmentExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kmv.containment(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvContainmentExpr = copy(left = l, right = r)
  override def prettyName: String = "kmv_containment"
}

/** Exact top-k per group as a bounded-heap aggregate. Each map-side
  * partial ships at most k rows per group through the shuffle — the
  * scale-correct alternative to a row_number window (which shuffles and
  * sorts EVERY row of every group). Ordering: value desc, then item asc
  * (deterministic under ties). Returns array<struct<value, item>>.
  */
case class TopKByAgg(
    value: Expression,
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, String)]]
  with ExpectsInputTypes {

  require(k >= 1 && k <= 100000, s"topk_by: k=$k outside [1, 100000]")

  override def children: Seq[Expression] = Seq(value, item)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("item", StringType, nullable = false))), containsNull = false)

  // min-heap on (value asc, item desc) so the head is the WORST kept
  // entry: evict when a better one arrives
  private def heapOrd: Ordering[(Double, String)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.String)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, String)] =
    mutable.PriorityQueue.empty(heapOrd)

  private def offer(heap: mutable.PriorityQueue[(Double, String)],
      entry: (Double, String)): Unit = {
    if (heap.size < k) heap.enqueue(entry)
    else if (heapOrd.lt(entry, heap.head)) { heap.dequeue(); heap.enqueue(entry) }
  }

  override def update(heap: mutable.PriorityQueue[(Double, String)],
      input: InternalRow): mutable.PriorityQueue[(Double, String)] = {
    val v = value.eval(input)
    val it = item.eval(input)
    if (v != null && it != null)
      offer(heap, (v.asInstanceOf[Double], it.asInstanceOf[UTF8String].toString))
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Double, String)],
      b: mutable.PriorityQueue[(Double, String)]): mutable.PriorityQueue[(Double, String)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(heap: mutable.PriorityQueue[(Double, String)]): Any =
    new GenericArrayData(heap.toSeq
      .sortBy { case (v, it) => (-v, it) }
      .map { case (v, it) => InternalRow(v, UTF8String.fromString(it)) }
      .toArray)

  override def serialize(heap: mutable.PriorityQueue[(Double, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (v, it) =>
      out.writeDouble(v)
      val b = it.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val sz = in.readInt()
    (0 until sz).foreach { _ =>
      val v = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      heap.enqueue((v, new String(b, "UTF-8")))
    }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByAgg =
    copy(value = c(0), item = c(1))
  override def prettyName: String = "topk_by"
}

/** Column-level entry points (mirrors `graft.functions` style). */
/** Count-Min sketch (Cormode & Muthukrishnan 2005): point-frequency
  * estimates over a stream/corpus in depth × width counters. The
  * guarantee direction dedup/quota pipelines rely on: estimates NEVER
  * undercount, and overcount by at most ε·N (ε = e/width) with
  * probability 1-δ (δ = e^-depth) — the point-query complement of
  * SpaceSaving's top-k. Merging is element-wise addition, so sketches
  * are order/partition independent and re-aggregable like the
  * HLL/KLL/KMV family. Row hashes derive from two xxhash64 seeds via
  * Kirsch-Mitzenmacher double hashing (h1 + i·h2).
  */
object Cms {
  val Seed1 = 0x5EED1L
  val Seed2 = 0x5EED2L

  /** serialized form: depth (4 BE), width (4 BE), depth*width longs */
  def serialize(d: Int, w: Int, counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counters.length * 8)
    bb.putInt(d); bb.putInt(w)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def add(counters: Array[Long], d: Int, w: Int, h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < d) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, w.toLong).toInt
      counters(i * w + idx) += 1L
      i += 1
    }
  }

  /** Min-over-rows point estimate from a serialized sketch. */
  def estimate(bytes: Array[Byte], h1: Long, h2: Long): Long = {
    if (bytes == null || bytes.length < 8) return 0L
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    if (d <= 0 || w <= 0 || bytes.length < 8 + d.toLong * w * 8) return 0L
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, w.toLong)
      val c = bb.getLong(8 + (i.toLong * w + idx).toInt * 8)
      if (c < best) best = c
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || a.length < 8) return b
    if (b == null || b.length < 8) return a
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    val d = ba.getInt; val w = ba.getInt
    require(bb.getInt == d && bb.getInt == w,
      "cms_merge: sketches disagree on depth/width")
    // a valid header over a truncated counter body would otherwise hit
    // BufferUnderflowException in the getLong loop — fail descriptively
    // (estimate length-checks the same way and returns 0)
    require(d > 0 && w > 0 &&
      a.length >= 8 + d.toLong * w * 8 && b.length >= 8 + d.toLong * w * 8,
      s"cms_merge: truncated sketch body (depth=$d width=$w needs " +
        s"${8 + d.toLong * w * 8} bytes; got ${a.length} and ${b.length})")
    val out = new Array[Byte](a.length)
    val bo = java.nio.ByteBuffer.wrap(out)
    bo.putInt(d); bo.putInt(w)
    var i = 0
    val n = d * w
    while (i < n) { bo.putLong(ba.getLong + bb.getLong); i += 1 }
    out
  }
}

/** Aggregate: build a Count-Min sketch (BinaryType) over a STRING
  * column. Null inputs are skipped.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = 5,
    width: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"cms_sketch: depth $depth outside [1,16]")
  require(width >= 16 && width <= (1 << 22),
    s"cms_sketch: width $width outside [16, 4M]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XxHash64Function.hash(v, child.dataType, Cms.Seed1)
      val h2 = XxHash64Function.hash(v, child.dataType, Cms.Seed2)
      Cms.add(buf, depth, width, h1, h2)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = Cms.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Cms.serialize(depth, width, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "cms_sketch"
}

/** Aggregate: merge stored CMS sketches (BinaryType → BinaryType) —
  * the re-aggregation half; all inputs must share depth/width.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else Cms.mergeBytes(buf, v.asInstanceOf[Array[Byte]])
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Cms.mergeBytes(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
  override def prettyName: String = "cms_merge"
}

/** Scalar: point-frequency estimate of a STRING key from a serialized
  * CMS sketch (never undercounts).
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, key: Any): Any =
    Cms.estimate(sk.asInstanceOf[Array[Byte]],
      XxHash64Function.hash(key, StringType, Cms.Seed1),
      XxHash64Function.hash(key, StringType, Cms.Seed2))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimateExpr = copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

object Sketches {
  private def agg(e: aggregate.AggregateFunction): Column =
    ExpressionUtils.column(e.toAggregateExpression())

  /** Mergeable HLL sketch (binary) of a column's distinct values. */
  def hllSketch(c: Column, p: Int = 12): Column =
    agg(HllSketchAgg(ExpressionUtils.expression(c), p))

  /** Union stored HLL sketches back into one sketch. */
  def hllUnion(c: Column): Column =
    agg(HllUnionAgg(ExpressionUtils.expression(c)))

  /** Cardinality estimate from a serialized sketch (scalar). */
  def hllEstimate(c: Column): Column =
    ExpressionUtils.column(HllEstimateExpr(ExpressionUtils.expression(c)))

  /** One-shot approximate distinct count of a column. */
  def hllDistinct(c: Column, p: Int = 12): Column = hllEstimate(hllSketch(c, p))

  /** KLL quantile estimates at `probs` for a numeric column. */
  def kllQuantiles(c: Column, probs: Seq[Double], k: Int = 200): Column =
    agg(KllQuantileAgg(ExpressionUtils.expression(c.cast("double")), probs, k))

  /** SpaceSaving heavy hitters: array<struct<item,count,err>>. */
  def heavyHitters(c: Column, k: Int = 64): Column =
    agg(HeavyHittersAgg(ExpressionUtils.expression(c.cast("string")), k))

  /** KLL sketch in storable (binary) form. */
  def kllSketchBinary(c: Column, k: Int = 200): Column =
    agg(KllSketchAgg(ExpressionUtils.expression(c.cast("double")), k))

  /** Merge stored KLL sketches back into one sketch. */
  def kllMerge(c: Column): Column =
    agg(KllMergeAgg(ExpressionUtils.expression(c)))

  /** Quantile estimates out of a serialized KLL sketch (scalar). */
  def kllQuantilesOf(c: Column, probs: Seq[Double]): Column =
    ExpressionUtils.column(KllQuantilesOfExpr(
      ExpressionUtils.expression(c), probs))

  /** Mergeable Count-Min sketch (binary) over a column's values
    * (point-frequency estimates; never undercounts).
    */
  def cmsSketch(c: Column, depth: Int = 5, width: Int = 2048): Column =
    agg(CmsSketchAgg(ExpressionUtils.expression(c.cast("string")),
      depth, width))

  /** Merge stored CMS sketches back into one sketch. */
  def cmsMerge(c: Column): Column =
    agg(CmsMergeAgg(ExpressionUtils.expression(c)))

  /** Point-frequency estimate of `key` from a serialized CMS sketch. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    ExpressionUtils.column(CmsEstimateExpr(
      ExpressionUtils.expression(sketch),
      ExpressionUtils.expression(key.cast("string"))))

  /** Mergeable KMV bottom-k sketch (binary) — supports set operations. */
  def kmvSketch(c: Column, k: Int = 1024): Column =
    agg(KmvSketchAgg(ExpressionUtils.expression(c), k))

  /** Distinct estimate from a serialized KMV sketch (scalar). */
  def kmvEstimate(c: Column): Column =
    ExpressionUtils.column(KmvEstimateExpr(ExpressionUtils.expression(c)))

  /** Jaccard similarity estimate of two sketched sets (scalar). */
  def kmvJaccard(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvJaccardExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Intersection-size estimate of two sketched sets (scalar). */
  def kmvIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvIntersectExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Containment estimate |A∩B| / |A| — the ASYMMETRIC overlap
    * Jaccard misses: containment(A,B) ≈ 1 flags "A is inside B"
    * (a source quoted/wrapped wholesale by another) even when B is
    * huge and the Jaccard is tiny. Exact below sketch capacity, like
    * the other KMV estimators.
    */
  def kmvContainment(a: Column, b: Column): Column =
    ExpressionUtils.column(KmvContainmentExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Exact top-k (value desc, item asc) per group via bounded heaps. */
  def topKBy(value: Column, item: Column, k: Int): Column =
    agg(TopKByAgg(
      ExpressionUtils.expression(value.cast("double")),
      ExpressionUtils.expression(item.cast("string")), k))
}
