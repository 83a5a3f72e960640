package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Nearest-centroid assignment for IVF indexing — a custom Catalyst
  * expression with `doGenCode`: the centroid matrix rides into generated
  * code via `addReferenceObj` (one JVM array shared per task, no per-row
  * broadcasting or interpreted lambda over a literal array), and each row
  * costs one dot product per centroid.
  *
  * REQUIRES unit-norm centroids (IvfModel normalizes at train time): with
  * |c| = 1 the cosine ranking equals the dot-product ranking and no norms
  * are needed per row. Returns the `nprobe` nearest cell ids, nearest
  * first; ties break to the lower cell id (deterministic).
  */
case class NearestCellsExpr(child: Expression, centroids: Array[Array[Float]],
                            nprobe: Int) extends UnaryExpression {
  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe must be in [1, ${centroids.length}], got $nprobe")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  protected override def nullSafeEval(input: Any): Any =
    NearestCellsExpr.compute(input.asInstanceOf[ArrayData], centroids, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCellsExpr.compute($c, $cents, $nprobe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellsExpr {

  /** Top-`nprobe` cells by dot product against unit-norm centroids.
    * Null/absent coordinates contribute 0; vectors shorter than the
    * centroid dimension are zero-padded implicitly.
    */
  def compute(arr: ArrayData, centroids: Array[Array[Float]], nprobe: Int,
              isFloat: Boolean): ArrayData = {
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          s += x * cent(i)
        }
        i += 1
      }
      scores(c) = s
      c += 1
    }
    // selection of the top nprobe (k is small — O(k · nprobe))
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < nprobe) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && scores(i) > bestScore) { best = i; bestScore = scores(i) }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def nearestCells(v: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    GraftBridge.column(NearestCellsExpr(GraftBridge.expression(v), centroids, nprobe))
}
