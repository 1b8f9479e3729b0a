package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row top-k nearest centroids by cosine, PER SHARD — the sharded-IVF
  * probe kernel. [[TopCentroids]] keeps one global k-slot list; a sharded
  * search must instead probe the best `k` buckets of EVERY shard (any
  * query's nearest neighbor lives in exactly one hash shard, so skipping
  * a shard caps recall), which this kernel computes in ONE pass over the
  * merged shard-tagged centroid table: one k-slot running list per shard,
  * emitted as a flat array ordered (shard asc, rank asc). One expression
  * for the whole index keeps the probe projection's PLAN size constant in
  * the shard count — the alternative (one [[TopCentroids]] kernel and one
  * bucket join per shard, unioned) grows the plan linearly with K, which
  * at the envelope's own sizing (hundreds of shards) bills real planning
  * time on every search.
  *
  * Per-shard selection semantics are exactly [[TopCentroids]]'s: cosine
  * descending, centroid id ascending on ties, NaN ordered greatest,
  * dimension drift fails loudly. Centroid arrays arrive grouped by shard
  * (the caller sorts by (shard, cid)); group boundaries are precomputed
  * once at kernel construction.
  *
  * Returns array<struct<shard:int, cid:int, ccos:double>> with
  * Σ_shards min(k, C_shard) elements.
  */
case class ShardedTopCentroids(vec: Expression, norm: Expression,
    shards: Array[Int], cids: Array[Int], cvecs: Array[Array[Double]],
    cnorms: Array[Double], k: Int)
    extends BinaryExpression {

  require(k > 0 && shards.length == cids.length &&
    cids.length == cvecs.length && cids.length == cnorms.length)
  require(shards.isEmpty || (1 until shards.length).forall(i =>
    shards(i - 1) <= shards(i)), "centroids must arrive grouped by shard")

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, norm.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, n) => TypeCheckResult.TypeCheckFailure(
        s"sharded_top_centroids needs (array<float|double>, double), got " +
          s"(${v.simpleString(10)}, ${n.simpleString(10)})")
    }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("cid", IntegerType, nullable = false),
    StructField("ccos", DoubleType, nullable = false))), containsNull = false)

  // Case-class equality over Array fields is reference equality, under
  // which two semantically identical expressions never compare equal —
  // defeating subexpression elimination and plan-fragment caching.
  // Compare payload CONTENTS instead (cheap relative to planning: the
  // envelope caps the payload at ~4096 centroids).
  override def equals(other: Any): Boolean = other match {
    case that: ShardedTopCentroids =>
      vec == that.vec && norm == that.norm && k == that.k &&
        java.util.Arrays.equals(shards, that.shards) &&
        java.util.Arrays.equals(cids, that.cids) &&
        java.util.Arrays.equals(cnorms, that.cnorms) &&
        cvecs.length == that.cvecs.length &&
        cvecs.indices.forall(i => java.util.Arrays.equals(cvecs(i), that.cvecs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, norm, Int.box(k),
      Int.box(java.util.Arrays.hashCode(shards)),
      Int.box(java.util.Arrays.hashCode(cids)),
      Int.box(java.util.Arrays.hashCode(cnorms)),
      Int.box(cvecs.foldLeft(1)((h, v) => 31 * h + java.util.Arrays.hashCode(v))))

  @transient private lazy val kernel = new ShardedTopCentroids.Kernel(
    shards, cids, cvecs, cnorms, k,
    vec.dataType match { case ArrayType(FloatType, _) => true; case _ => false })

  override def nullSafeEval(v: Any, n: Any): Any =
    kernel.compute(v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("stcKernel", kernel,
      classOf[ShardedTopCentroids.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (v, n) => s"${ev.value} = $kRef.compute($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, norm = newRight)
}

object ShardedTopCentroids {
  /** Shared interpreted/codegen kernel; serializable so codegen can ship
    * it to executors as a reference object (the [[TopCentroids.Kernel]]
    * pattern, with per-shard group offsets precomputed).
    */
  final class Kernel(shards: Array[Int], cids: Array[Int],
      cvecs: Array[Array[Double]], cnorms: Array[Double], k: Int,
      vecIsFloat: Boolean) extends Serializable {

    // group boundaries over the shard-sorted centroid arrays:
    // groups(g) = first index of group g, groups(last) = length sentinel
    private val groups: Array[Int] = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < shards.length) {
        if (i == 0 || shards(i) != shards(i - 1)) b += i
        i += 1
      }
      b += shards.length
      b.result()
    }

    // Spark double ordering: NaN greatest; (cos desc, cid asc)
    private def beats(cosA: Double, cidA: Int, cosB: Double, cidB: Int): Boolean = {
      val c = java.lang.Double.compare(cosA, cosB)
      c > 0 || (c == 0 && cidA < cidB)
    }

    def compute(arr: ArrayData, vnorm: Double): ArrayData = {
      val dim = arr.numElements()
      val x = new Array[Double](dim)
      var i = 0
      if (vecIsFloat) while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      else while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
      val out = Array.newBuilder[Any]
      var g = 0
      while (g < groups.length - 1) {
        val start = groups(g)
        val end = groups(g + 1)
        val kk = math.min(k, end - start)
        val topCos = Array.fill(kk)(Double.NegativeInfinity)
        val topCid = Array.fill(kk)(Int.MaxValue)
        var j = start
        while (j < end) {
          val cv = cvecs(j)
          require(dim == cv.length,
            s"sharded_top_centroids: $dim-dim vector against ${cv.length}-dim centroid")
          var d = 0.0
          var t = 0
          while (t < dim) { d += x(t) * cv(t); t += 1 }
          val cos = d / (vnorm * cnorms(j))
          if (beats(cos, cids(j), topCos(kk - 1), topCid(kk - 1))) {
            var p = kk - 1
            while (p > 0 && beats(cos, cids(j), topCos(p - 1), topCid(p - 1))) {
              topCos(p) = topCos(p - 1); topCid(p) = topCid(p - 1); p -= 1
            }
            topCos(p) = cos; topCid(p) = cids(j)
          }
          j += 1
        }
        val shard = shards(start)
        var p = 0
        while (p < kk) {
          out += InternalRow(shard, topCid(p), topCos(p)); p += 1
        }
        g += 1
      }
      new GenericArrayData(out.result())
    }
  }
}
