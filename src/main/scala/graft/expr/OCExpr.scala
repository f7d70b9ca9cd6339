package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit}
import graft.units.Units
import graft.units.Units.UnitSpec

/** Column-expression DSL with unit inference (reference
  * python/opencosmo/column/column.py — SURVEY.md §2.5, §2.11).
  *
  * The reference builds a DAG of column producers and walks it with
  * `get_units` to infer/check units; here the ADT is a thin veneer
  * whose ONLY job is unit algebra — lowering hands Catalyst an
  * ordinary `Column`, so optimization/codegen are stock Spark. Unit
  * errors surface at plan-build time (before any job), matching the
  * reference's eager checks.
  *
  * Arithmetic:   c * c, c / c, c + c, c - c, c ** n, unary -
  * Math:         log10 (→ dex), exp10, sqrt, arcsin/arccos (→ rad),
  *               arctan2 (→ rad)
  * Reductions:   mean, std, min, max, sum, median, quantile(q) —
  *               DerivedScalarValue analogs usable inside expressions
  *               and predicates (resolved by OCDataset via
  *               agg-then-substitute).
  * Predicates:   > >= < <= === =!= isin between — produce OCMask.
  */
sealed trait OCExpr {
  import OCExpr._

  /** Inferred unit given the units of referenced columns. */
  def unitIn(env: String => UnitSpec): UnitSpec = this match {
    case Ref(n)          => env(n)
    case Lit(_)          => Units.dimensionless
    case Bin(a, "*", b)  => a.unitIn(env) * b.unitIn(env)
    case Bin(a, "/", b)  => a.unitIn(env) / b.unitIn(env)
    case Bin(a, "+", b)  => a.unitIn(env).requireSame(b.unitIn(env), "+")
    case Bin(a, "-", b)  => a.unitIn(env).requireSame(b.unitIn(env), "-")
    case Pow(a, p)       => a.unitIn(env).pow(p)
    case Neg(a)          => a.unitIn(env)
    case Fn(a, "log10")  => Units.dexOf(a.unitIn(env))
    case Fn(a, "exp10")  =>
      val u = a.unitIn(env)
      if (u.dex) UnitSpec(u.dims, u.h) else Units.dimensionless
    case Fn(a, "sqrt")   =>
      val u = a.unitIn(env)
      require(u.dims.values.forall(_ % 2 == 0) && u.h % 2 == 0,
        s"sqrt of non-square unit $u")
      UnitSpec(u.dims.map { case (k, v) => k -> v / 2 }, u.h / 2)
    case Fn(a, f) if f == "arcsin" || f == "arccos" =>
      require(a.unitIn(env).isDimensionless, s"trig needs dimensionless input")
      Units.rad
    case Atan2(a, b) =>
      a.unitIn(env).requireSame(b.unitIn(env), "arctan2"); Units.rad
    case Fn(a, _)        => a.unitIn(env)
    case Reduce(a, op, _) => op match {
      case "var" => a.unitIn(env).pow(2)
      case _     => a.unitIn(env)
    }
    case Bin(_, op, _) => // DSL only builds * / + - ; fail loudly
      throw new IllegalArgumentException(s"unknown binary operator '$op'")
  }

  /** Lower to a Spark Column. Reductions must have been substituted
    * first (OCDataset.resolveScalars) — hitting one here throws.
    */
  def toColumn: Column = this match {
    case Ref(n)         => col(n)
    case Lit(v)         => lit(v)
    case Bin(a, "*", b) => a.toColumn * b.toColumn
    case Bin(a, "/", b) => a.toColumn / b.toColumn
    case Bin(a, "+", b) => a.toColumn + b.toColumn
    case Bin(a, "-", b) => a.toColumn - b.toColumn
    case Bin(_, op, _)  => throw new IllegalStateException(s"op $op")
    case Pow(a, p)      => F.pow(a.toColumn, lit(p.toDouble))
    case Neg(a)         => -a.toColumn
    case Fn(a, "log10") => F.log10(a.toColumn)
    case Fn(a, "exp10") => F.pow(lit(10.0), a.toColumn)
    case Fn(a, "sqrt")  => F.sqrt(a.toColumn)
    case Fn(a, "arcsin") => F.asin(a.toColumn)
    case Fn(a, "arccos") => F.acos(a.toColumn)
    case Fn(a, f)       => throw new IllegalStateException(s"fn $f")
    case Atan2(a, b)    => F.atan2(a.toColumn, b.toColumn)
    case Reduce(_, op, _) =>
      throw new IllegalStateException(
        s"unresolved scalar reduction '$op' — evaluate via OCDataset (resolveScalars)")
  }

  /** All reductions contained in this expression (for the
    * agg-then-substitute pass; reference resolve_mask_scalars).
    */
  def reductions: Seq[Reduce] = this match {
    case r: Reduce   => Seq(r) ++ r.of.reductions
    case Bin(a, _, b) => a.reductions ++ b.reductions
    case Atan2(a, b)  => a.reductions ++ b.reductions
    case Pow(a, _)    => a.reductions
    case Neg(a)       => a.reductions
    case Fn(a, _)     => a.reductions
    case _            => Nil
  }

  /** Substitute evaluated scalar values for reductions. */
  def substitute(values: Map[Reduce, Double]): OCExpr = this match {
    case r: Reduce if values.contains(r) => Lit(values(r))
    case Bin(a, op, b) => Bin(a.substitute(values), op, b.substitute(values))
    case Atan2(a, b)   => Atan2(a.substitute(values), b.substitute(values))
    case Pow(a, p)     => Pow(a.substitute(values), p)
    case Neg(a)        => Neg(a.substitute(values))
    case Fn(a, f)      => Fn(a.substitute(values), f)
    case other         => other
  }

  // arithmetic surface
  def *(o: OCExpr): OCExpr = Bin(this, "*", o)
  def /(o: OCExpr): OCExpr = Bin(this, "/", o)
  def +(o: OCExpr): OCExpr = Bin(this, "+", o)
  def -(o: OCExpr): OCExpr = Bin(this, "-", o)
  def **(p: Int): OCExpr = Pow(this, p)
  def unary_- : OCExpr = Neg(this)
  def *(v: Double): OCExpr = Bin(this, "*", Lit(v))
  def /(v: Double): OCExpr = Bin(this, "/", Lit(v))
  def +(v: Double): OCExpr = Bin(this, "+", Lit(v))
  def -(v: Double): OCExpr = Bin(this, "-", Lit(v))

  // math surface
  def log10: OCExpr = Fn(this, "log10")
  def exp10: OCExpr = Fn(this, "exp10")
  def sqrt: OCExpr = Fn(this, "sqrt")
  def arcsin: OCExpr = Fn(this, "arcsin")
  def arccos: OCExpr = Fn(this, "arccos")

  // reductions (usable inside expressions and masks)
  def mean: OCExpr = Reduce(this, "mean", 0.0)
  def std: OCExpr = Reduce(this, "std", 0.0)
  def variance: OCExpr = Reduce(this, "var", 0.0)
  def min: OCExpr = Reduce(this, "min", 0.0)
  def max: OCExpr = Reduce(this, "max", 0.0)
  def sum: OCExpr = Reduce(this, "sum", 0.0)
  def median: OCExpr = Reduce(this, "median", 0.5)
  def quantile(q: Double): OCExpr = Reduce(this, "quantile", q)

  // predicates
  def >(o: OCExpr): OCMask = OCMask.Cmp(this, ">", o)
  def >=(o: OCExpr): OCMask = OCMask.Cmp(this, ">=", o)
  def <(o: OCExpr): OCMask = OCMask.Cmp(this, "<", o)
  def <=(o: OCExpr): OCMask = OCMask.Cmp(this, "<=", o)
  def ===(o: OCExpr): OCMask = OCMask.Cmp(this, "==", o)
  def =!=(o: OCExpr): OCMask = OCMask.Cmp(this, "!=", o)
  def >(v: Double): OCMask = this > OCExpr.Lit(v)
  def >=(v: Double): OCMask = this >= OCExpr.Lit(v)
  def <(v: Double): OCMask = this < OCExpr.Lit(v)
  def <=(v: Double): OCMask = this <= OCExpr.Lit(v)
  def ===(v: Double): OCMask = this === OCExpr.Lit(v)
  def =!=(v: Double): OCMask = this =!= OCExpr.Lit(v)
  def isin(vs: Any*): OCMask = OCMask.In(this, vs)
}

object OCExpr {
  final case class Ref(name: String) extends OCExpr
  final case class Lit(value: Double) extends OCExpr
  final case class Bin(a: OCExpr, op: String, b: OCExpr) extends OCExpr
  final case class Pow(a: OCExpr, p: Int) extends OCExpr
  final case class Neg(a: OCExpr) extends OCExpr
  final case class Fn(a: OCExpr, name: String) extends OCExpr
  final case class Atan2(a: OCExpr, b: OCExpr) extends OCExpr
  /** Whole-column reduction (reference DerivedScalarValue). */
  final case class Reduce(of: OCExpr, op: String, q: Double) extends OCExpr {
    /** Spark aggregate column computing this reduction exactly
      * (median/quantile use exact percentile to match numpy).
      */
    def aggColumn: Column = {
      val c = of.toColumn
      op match {
        case "mean"     => F.avg(c)
        case "std"      => F.stddev_pop(c)
        case "var"      => F.var_pop(c)
        case "min"      => F.min(c)
        case "max"      => F.max(c)
        case "sum"      => F.sum(c)
        case "median"   => F.percentile(c, lit(0.5))
        case "quantile" => F.percentile(c, lit(q))
      }
    }
  }

  def ocCol(name: String): OCExpr = Ref(name)
  def ocLit(v: Double): OCExpr = Lit(v)
  def arctan2(a: OCExpr, b: OCExpr): OCExpr = Atan2(a, b)
}

/** Boolean mask tree (reference ColumnMask / CompoundColumnMask). */
sealed trait OCMask {
  import OCMask._

  def toColumn: Column = this match {
    case Cmp(a, op, b) =>
      val (ca, cb) = (a.toColumn, b.toColumn)
      op match {
        case ">" => ca > cb;  case ">=" => ca >= cb
        case "<" => ca < cb;  case "<=" => ca <= cb
        case "==" => ca === cb; case "!=" => ca =!= cb
      }
    case In(a, vs)  => a.toColumn.isin(vs: _*)
    case And(a, b)  => a.toColumn && b.toColumn
    case Or(a, b)   => a.toColumn || b.toColumn
    case Not(a)     => !a.toColumn
  }

  def reductions: Seq[OCExpr.Reduce] = this match {
    case Cmp(a, _, b) => a.reductions ++ b.reductions
    case In(a, _)     => a.reductions
    case And(a, b)    => a.reductions ++ b.reductions
    case Or(a, b)     => a.reductions ++ b.reductions
    case Not(a)       => a.reductions
  }

  /** Plan-time unit validation: arithmetic INSIDE the mask obeys the
    * expression rules (`unitIn` throws on malformed add/sub), and a
    * comparison between two UNITFUL sides requires identical units. A
    * dimensionless side (raw literal) compares in the other side's
    * native unit — the reference's `col("mass") > 0` idiom stays
    * legal.
    */
  def unitCheck(env: String => UnitSpec): Unit = this match {
    case Cmp(a, op, b) =>
      val (ua, ub) = (a.unitIn(env), b.unitIn(env))
      if (!ua.isDimensionless && !ub.isDimensionless) {
        ua.requireSame(ub, s"comparison '$op'"); ()
      }
    case In(a, _)  => a.unitIn(env); ()
    case And(a, b) => a.unitCheck(env); b.unitCheck(env)
    case Or(a, b)  => a.unitCheck(env); b.unitCheck(env)
    case Not(a)    => a.unitCheck(env)
  }

  def substitute(values: Map[OCExpr.Reduce, Double]): OCMask = this match {
    case Cmp(a, op, b) => Cmp(a.substitute(values), op, b.substitute(values))
    case In(a, vs)     => In(a.substitute(values), vs)
    case And(a, b)     => And(a.substitute(values), b.substitute(values))
    case Or(a, b)      => Or(a.substitute(values), b.substitute(values))
    case Not(a)        => Not(a.substitute(values))
  }

  def &&(o: OCMask): OCMask = And(this, o)
  def ||(o: OCMask): OCMask = Or(this, o)
  def unary_! : OCMask = Not(this)
}

object OCMask {
  final case class Cmp(a: OCExpr, op: String, b: OCExpr) extends OCMask
  final case class In(a: OCExpr, vs: Seq[Any]) extends OCMask
  final case class And(a: OCMask, b: OCMask) extends OCMask
  final case class Or(a: OCMask, b: OCMask) extends OCMask
  final case class Not(a: OCMask) extends OCMask
}
