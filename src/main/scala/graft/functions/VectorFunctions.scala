package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, expressed with
  * higher-order functions (`aggregate`/`zip_with`) so everything stays
  * codegen'd and map-side. All arithmetic is widened to double BEFORE
  * multiply — keeps results deterministic and oracle-comparable.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (double). */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** ‖a‖₂. */
  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); null-safe for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** ‖a−b‖₂ (euclidean distance). */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** Deterministic pseudo-random unit-ish hyperplane for LSH: component
    * j of plane p derived from xxhash64 — reproducible across runs and
    * engines without an RNG. The weights are constants, so they FOLD at
    * plan-build time (Catalyst does not constant-fold through the
    * `transform` HOF, which used to cost nPlanes·dim hash calls per
    * ROW): each component is the same `xxhash64(…)/Long.MaxValue`
    * Catalyst expression evaluated eagerly over its literal input, so
    * the values are bit-identical to the per-row form.
    */
  def hyperplane(planeId: Int, dim: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val vals = Array.tabulate(dim) { j =>
      val h = new XxHash64(Seq(Literal(s"plane$planeId|$j")))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Long]
      h.toDouble / Long.MaxValue.toDouble
    }
    array(vals.map(lit).toIndexedSeq: _*)
  }

  /** Random-hyperplane (sign) LSH bucket id from `nPlanes` planes:
    * bit p = sign(v · plane_p). One long column, map-side only.
    */
  def signLshBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      when(dot(v, hyperplane(p, dim)) >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SQL-replayable twin of [[hyperplane]]: component j of plane p is
    * md5("plane p|j")'s first 8 hex chars as a 32-bit unsigned int,
    * scaled to [-1, 1) — any SQL engine with md5 reproduces it
    * bit-for-bit (DuckDB: ('0x'||substr(md5(...),1,8))::BIGINT /
    * 2^31 - 1).
    */
  def hyperplaneMd5(planeId: Int, dim: Int): Column = {
    // folded driver-side like [[hyperplane]] (md5 of a constant string
    // is a constant; per-row evaluation cost nPlanes·dim md5 calls)
    import org.apache.spark.sql.catalyst.expressions.{Literal, Md5}
    val vals = Array.tabulate(dim) { j =>
      val hex = Md5(Literal(s"plane$planeId|$j".getBytes("UTF-8")))
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty).toString
      java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble /
        2147483648.0 - 1.0
    }
    array(vals.map(lit).toIndexedSeq: _*)
  }

  /** [[signLshBucket]] over the md5 plane family — the gate kernel
    * for DuckDB-replayable LSH bucketing.
    */
  def signLshBucketMd5(v: Column, nPlanes: Int, dim: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      when(dot(v, hyperplaneMd5(p, dim)) >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
