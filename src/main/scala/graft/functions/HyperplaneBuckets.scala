package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd OR-banded sign-bit LSH bucketing over an embedding column:
  * returns `array<long>` of `bands` bucket ids, bit j of band b = sign of
  * the projection onto pseudo-random hyperplane p = b*planesPerBand + j.
  *
  * Why a custom Expression (brief preference order (b)): the composed
  * form ([[graft.simsearch.SimSearch.bucketKey]]) evaluates one
  * `aggregate(zip_with(...))` per plane — bands*planesPerBand = 128
  * traversals of the embedding with an intermediate array allocation
  * each. This fused loop reads the embedding ONCE, accumulating all 128
  * projections per element, inside whole-stage codegen with zero
  * intermediate allocations.
  *
  * Numeric contract: hyperplane component for (plane p, dim i) =
  * ((i*2654435761 + p*40503 + 2166136261) mod 1000003) / 500001.5 - 1.0,
  * elements widened to double, per-plane accumulation in ascending
  * element order — bit-identical to the composed form AND to the DuckDB
  * oracle's SQL mirror (SparkEntry.lshBandCtes), so swapping it in
  * changes no query result. Null arrays and null elements yield NULL
  * (same convention as [[CosineSimilarity]]).
  */
case class HyperplaneBuckets(child: Expression, bands: Int,
    planesPerBand: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float>/array<double>, got " +
            other.catalogString)
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val nPlanes = bands * planesPerBand
    val proj = new Array[Double](nPlanes)
    val isFloat = elemIsFloat
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val base = i.toLong * 2654435761L
      var p = 0
      while (p < nPlanes) {
        val h = (base + p.toLong * 40503L + 2166136261L) % 1000003L
        proj(p) += xi * ((h.toDouble / 500001.5) - 1.0)
        p += 1
      }
      i += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var v = 0L
      var j = 0
      while (j < planesPerBand) {
        if (proj(b * planesPerBand + j) >= 0) v |= 1L << j
        j += 1
      }
      buckets(b) = v
      b += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val proj = ctx.freshName("proj")
      val buckets = ctx.freshName("buckets")
      val nPlanes = bands * planesPerBand
      val getX =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $proj = new double[$nPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = $getX;
         |  long $base = ((long) $i) * 2654435761L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    long $h = ($base + ((long) $p) * 40503L + 2166136261L) % 1000003L;
         |    $proj[$p] += $xi * (((double) $h) / 500001.5 - 1.0);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long[] $buckets = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $v = 0L;
         |    for (int $j = 0; $j < $planesPerBand; $j++) {
         |      if ($proj[$b * $planesPerBand + $j] >= 0) $v |= 1L << $j;
         |    }
         |    $buckets[$b] = $v;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def buckets(embedding: Column, bands: Int, planesPerBand: Int): Column =
    Bridge.column(HyperplaneBuckets(
      Bridge.expression(embedding), bands, planesPerBand))
}
