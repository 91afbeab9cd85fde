package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sparse linear-algebra kernel over DataFrames — the Spark-native analogue of
 * the reference's GraphBLAS wrapper (g4s-sparse, SURVEY §2.3).
 *
 * A matrix is a COO DataFrame `(i BIGINT, j BIGINT, v <type>)`; a vector is
 * `(i BIGINT, v <type>)`. The reference binds SuiteSparse:GraphBLAS over JNI
 * (g4s-sparse/.../grbv2/MatrixOps.scala); here every kernel op compiles to a
 * declarative join/aggregate plan so Catalyst/Tungsten/AQE choose the
 * physical strategy, which is what makes the same code run at 100 TB: mxm is
 * a shuffle (or broadcast) hash join + partial aggregation, never a dense
 * N×N structure.
 *
 * Ops carry the GraphBLAS-style optional `mask` (+ `complement`) and `accum`
 * arguments (reference MatrixOps.scala:162-197): a mask compiles to a
 * left-semi (or left-anti) join on (i,j); an accumulator compiles to
 * eWiseAdd with the prior output.
 */
final case class GrMatrix(df: DataFrame) {
  /** Memoized — the wrapper is immutable, so the count is stable; repeated
    * scalar probes (isAll + nvals in one driver-valued query) pay one job. */
  lazy val nvals: Long = df.count()
  def transpose: GrMatrix = GrMatrix(df.select(col("j").as("i"), col("i").as("j"), col("v")))
  def cache(): GrMatrix = GrMatrix(df.cache())
  /** Reference lifecycle ops (grbv2/GrBMatrixOps.scala:19-155): `clear` keeps
    * the schema, drops every cell; `duplicate` is sharing — DataFrames are
    * immutable, so the reference's defensive copy dissolves into identity. */
  def clear: GrMatrix = GrMatrix(df.filter(lit(false)))
  def duplicate: GrMatrix = this

  /** Paged COO scan-out: the matrix as an iterator of `(is, js, vs)` blocks
    * of ≤ `pageSize` cells — the reference's `BlockingMatrix.toStream`
    * surface (g4s-optimizer/.../matrix/BlockingMatrix.scala:39-94, an
    * fs2.Stream of ~1024-row COO extracts). Spark-native: `toLocalIterator`
    * streams ONE partition at a time to the driver — never the whole matrix
    * — regrouped into fixed-size pages, so peak driver memory is one page +
    * one partition's fetch buffer regardless of matrix size. */
  def pages(pageSize: Int = 1024): Iterator[(Array[Long], Array[Long], Array[Any])] = {
    require(pageSize > 0, s"pageSize must be positive: $pageSize")
    import scala.jdk.CollectionConverters._
    df.select(org.apache.spark.sql.functions.col("i"),
        org.apache.spark.sql.functions.col("j"),
        org.apache.spark.sql.functions.col("v"))
      .toLocalIterator().asScala
      .grouped(pageSize)
      .map { rows =>
        (rows.map(_.getLong(0)).toArray,
         rows.map(_.getLong(1)).toArray,
         rows.map(_.get(2)).toArray)
      }
  }
}

final case class GrVector(df: DataFrame) {
  lazy val nvals: Long = df.count()
  def clear: GrVector = GrVector(df.filter(lit(false)))
}

/** Element-wise binary operator over value columns (reference GrBBinaryOp catalog,
  * g4s-sparse/.../grb/GrBBinaryOp.scala:24-57). */
final case class BinaryOp(name: String)(val apply: (Column, Column) => Column)

/** (combine, aggregate) monoid — `agg` is the distributed groupBy form,
  * `combine` the two-argument form used by element-wise union
  * (reference GrBMonoid, grb/GrBMonoid.scala:8-25). */
final case class Monoid(name: String)(val agg: Column => Column)(val combine: (Column, Column) => Column)

/** plus-monoid ⊕ times-op semiring (reference GrBSemiring, grb/GrBSemiring.scala:18-45). */
final case class Semiring(plus: Monoid, times: BinaryOp) {
  def name: String = s"${plus.name}_${times.name}"
}

object Ops {
  // --- binary op catalog (reference grb/GrBBinaryOp.scala:24-57) ---
  val first: BinaryOp  = BinaryOp("first")((a, _) => a)
  val second: BinaryOp = BinaryOp("second")((_, b) => b)
  val any: BinaryOp    = BinaryOp("any")((a, _) => a)
  val pair: BinaryOp   = BinaryOp("pair")((_, _) => lit(true))
  val min: BinaryOp    = BinaryOp("min")(least(_, _))
  val max: BinaryOp    = BinaryOp("max")(greatest(_, _))
  val plus: BinaryOp   = BinaryOp("plus")(_ + _)
  val minus: BinaryOp  = BinaryOp("minus")(_ - _)
  val rminus: BinaryOp = BinaryOp("rminus")((a, b) => b - a)
  val times: BinaryOp  = BinaryOp("times")(_ * _)
  val div: BinaryOp    = BinaryOp("div")(_ / _)
  val rdiv: BinaryOp   = BinaryOp("rdiv")((a, b) => b / a)
  val lor: BinaryOp    = BinaryOp("lor")(_ || _)
  val land: BinaryOp   = BinaryOp("land")(_ && _)
  val lxor: BinaryOp   = BinaryOp("lxor")(_ =!= _)
  // comparisons to Boolean (reference `eq ne gt lt ge le`)
  val eq: BinaryOp = BinaryOp("eq")(_ === _)
  val ne: BinaryOp = BinaryOp("ne")(_ =!= _)
  val gt: BinaryOp = BinaryOp("gt")(_ > _)
  val lt: BinaryOp = BinaryOp("lt")(_ < _)
  val ge: BinaryOp = BinaryOp("ge")(_ >= _)
  val le: BinaryOp = BinaryOp("le")(_ <= _)
  // IS* comparisons to the numeric domain (GraphBLAS returns 0/1 in-domain,
  // reference grb/GrBBinaryOp.scala:24-57); INT 0/1 here — Spark's arithmetic
  // coercion widens it wherever the value participates in further algebra
  private def is(name: String)(c: (Column, Column) => Column): BinaryOp =
    BinaryOp(name)((a, b) => c(a, b).cast("int"))
  val iseq: BinaryOp = is("iseq")(_ === _)
  val isne: BinaryOp = is("isne")(_ =!= _)
  val isgt: BinaryOp = is("isgt")(_ > _)
  val islt: BinaryOp = is("islt")(_ < _)
  val isge: BinaryOp = is("isge")(_ >= _)
  val isle: BinaryOp = is("isle")(_ <= _)

  // --- monoids ---
  private val F = org.apache.spark.sql.functions
  val minM: Monoid  = Monoid("min")(F.min)((a, b) => least(a, b))
  val maxM: Monoid  = Monoid("max")(F.max)((a, b) => greatest(a, b))
  val plusM: Monoid = Monoid("plus")(F.sum)(_ + _)
  /** Exact product monoid over the full double domain (negatives and zeros
    * included) — a typed Aggregator, matching the reference's true per-type
    * TIMES monoid (grb/GrBMonoid.scala:31-68). Distributed as partial
    * products merged multiplicatively (map-side combine works: * is
    * associative & commutative). Round 1 shipped exp∘Σ∘log, which was
    * positive-domain only. */
  private object ProductAgg extends org.apache.spark.sql.expressions.Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
    def outputEncoder: org.apache.spark.sql.Encoder[Double] = org.apache.spark.sql.Encoders.scalaDouble
  }
  private lazy val productUdaf = F.udaf(ProductAgg, org.apache.spark.sql.Encoders.scalaDouble)
  val timesM: Monoid = Monoid("times")(c => productUdaf(c.cast("double")))(_ * _)
  val lorM: Monoid  = Monoid("lor")(F.max)(_ || _)
  val landM: Monoid = Monoid("land")(F.min)(_ && _)
  val anyM: Monoid  = Monoid("any")(F.first(_))((a, _) => a)

  // --- semirings (reference prebuilt anyPair, grb/GrBSemiring.scala:38-44) ---
  val anyPair: Semiring   = Semiring(anyM, pair)
  val plusTimes: Semiring = Semiring(plusM, times)
  val minPlus: Semiring   = Semiring(minM, plus)
  val maxMin: Semiring    = Semiring(maxM, min)
  val lorLand: Semiring   = Semiring(lorM, land)
}

/** Row/column selector for extract/assign (reference GrBRange,
  * g4s-sparse/.../grbv2/GrBRange.scala:7-72). */
sealed trait GrRange { def pred(c: Column): Option[Column] }
case object All extends GrRange { def pred(c: Column): Option[Column] = None }
final case class Indices(ix: Seq[Long]) extends GrRange {
  def pred(c: Column): Option[Column] = Some(c.isin(ix: _*))
}
final case class Span(start: Long, endInclusive: Long) extends GrRange {
  def pred(c: Column): Option[Column] = Some(c.between(start, endInclusive))
}
/** GxB_STRIDE / GxB_BACKWARDS selector (reference GrBRange.scala:7-45):
  * start..end inclusive stepping by `inc`; a NEGATIVE inc steps DOWN from
  * start to end (GxB backwards). Membership is a pure arithmetic predicate,
  * so extract/assign keep their single codegen'd filter — no index list is
  * ever materialized (a stride over a 10⁹ dimension must not become a
  * billion-element isin). */
final case class Stride(start: Long, endInclusive: Long, inc: Long) extends GrRange {
  require(inc != 0, "stride increment must be non-zero")
  def pred(c: Column): Option[Column] =
    if (inc > 0) Some(c.between(start, endInclusive) && (c - start) % inc === 0)
    else Some(c.between(endInclusive, start) && (lit(start) - c) % -inc === 0)
}

object GrOps {
  import Ops._

  /** The ANY_PAIR existence-only fast path fires on OBJECT IDENTITY with the
    * catalog ops, never on names: `BinaryOp`/`Monoid` equality would otherwise
    * compare only the name field (the function payloads live in second
    * parameter lists, invisible to case-class equality), so a user-defined
    * `BinaryOp("pair")((a,b) => …)` with different semantics would silently
    * take the existence-only shortcut. A non-catalog semiring that happens to
    * be named "pair" takes the general path, which computes the same result
    * for the genuine pair/any ops — the fast path is purely a plan shape
    * optimization (join+distinct instead of join+aggregate). */
  private def isAnyPair(s: Semiring): Boolean =
    (s.plus eq anyM) && (s.times eq pair)

  private def a(m: GrMatrix): DataFrame = m.df.select(col("i").as("ai"), col("j").as("aj"), col("v").as("av"))
  private def b(m: GrMatrix): DataFrame = m.df.select(col("i").as("bi"), col("j").as("bj"), col("v").as("bv"))

  /**
   * C = A ⊕.⊗ B (reference MxM.mxm, grbv2/MatrixOps.scala:162-197).
   * Join on the contraction index + map-side-combinable aggregation; the
   * ANY_PAIR structural semiring degenerates to join + distinct — no value
   * arithmetic, mirroring the reference's existence-only optimization
   * (optim/impls/Operator.scala:401-424).
   */
  def mxm(s: Semiring)(A: GrMatrix, B: GrMatrix,
                       mask: Option[GrMatrix] = None, complement: Boolean = false,
                       accum: Option[BinaryOp] = None, previous: Option[GrMatrix] = None): GrMatrix = {
    val joined = a(A).join(b(B), col("aj") === col("bi"))
    val prod =
      if (isAnyPair(s))
        joined.select(col("ai").as("i"), col("bj").as("j")).distinct()
          .withColumn("v", lit(true))
      else
        joined.groupBy(col("ai").as("i"), col("bj").as("j"))
          .agg(s.plus.agg(s.times.apply(col("av"), col("bv"))).as("v"))
    finish(GrMatrix(prod), mask, complement, accum, previous)
  }

  /** w = u ⊕.⊗ A (row-vector × matrix; reference vxm via mxm on 1×N).
    * Mask/accumulator threading mirrors the matrix ops (the reference passes
    * them through every kernel call, grbv2/MatrixOps.scala:164-171). */
  def vxm(s: Semiring)(u: GrVector, A: GrMatrix,
                       mask: Option[GrVector] = None, complement: Boolean = false,
                       accum: Option[BinaryOp] = None, previous: Option[GrVector] = None): GrVector = {
    val j = u.df.select(col("i").as("ui"), col("v").as("uv"))
      .join(a(A), col("ui") === col("ai"))
    val out =
      if (isAnyPair(s)) j.select(col("aj").as("i")).distinct().withColumn("v", lit(true))
      else j.groupBy(col("aj").as("i")).agg(s.plus.agg(s.times.apply(col("uv"), col("av"))).as("v"))
    finishVec(GrVector(out), mask, complement, accum, previous)
  }

  /** eWiseAdd — union of patterns, overlaps combined (reference ElemWise.union,
    * grbv2/ElemWise.scala:12-52): full-outer join on (i,j) + coalesce. */
  def eWiseAdd(op: BinaryOp)(A: GrMatrix, B: GrMatrix,
                             mask: Option[GrMatrix] = None, complement: Boolean = false,
                             accum: Option[BinaryOp] = None, previous: Option[GrMatrix] = None): GrMatrix = {
    val out = a(A).join(b(B), col("ai") === col("bi") && col("aj") === col("bj"), "full_outer")
      .select(
        coalesce(col("ai"), col("bi")).as("i"),
        coalesce(col("aj"), col("bj")).as("j"),
        when(col("av").isNotNull && col("bv").isNotNull, op.apply(col("av"), col("bv")))
          .otherwise(coalesce(col("av"), col("bv"))).as("v"))
    finish(GrMatrix(out), mask, complement, accum, previous)
  }

  /** eWiseMult — intersection of patterns (reference ElemWise.intersect,
    * grbv2/ElemWise.scala:55-95): inner join on (i,j). */
  def eWiseMult(op: BinaryOp)(A: GrMatrix, B: GrMatrix,
                              mask: Option[GrMatrix] = None, complement: Boolean = false,
                              accum: Option[BinaryOp] = None, previous: Option[GrMatrix] = None): GrMatrix = {
    val out = a(A).join(b(B), col("ai") === col("bi") && col("aj") === col("bj"))
      .select(col("ai").as("i"), col("aj").as("j"), op.apply(col("av"), col("bv")).as("v"))
    finish(GrMatrix(out), mask, complement, accum, previous)
  }

  /** Element-wise union for vectors (accumulator support path). */
  def eWiseAddVec(op: BinaryOp)(u: GrVector, w: GrVector): GrVector = {
    val out = u.df.select(col("i").as("ui"), col("v").as("uv"))
      .join(w.df.select(col("i").as("wi"), col("v").as("wv")),
        col("ui") === col("wi"), "full_outer")
      .select(coalesce(col("ui"), col("wi")).as("i"),
        when(col("uv").isNotNull && col("wv").isNotNull, op.apply(col("uv"), col("wv")))
          .otherwise(coalesce(col("uv"), col("wv"))).as("v"))
    GrVector(out)
  }

  /** to = from(I, J) (reference extract, grbv2/MatrixOps.scala:46-75). Indices
    * are NOT re-based — callers keep the global id space (the Spark model has
    * no dense-index assumption to preserve). Mask/accum are threaded exactly
    * like every other kernel op (the reference passes them through extract
    * too, MatrixOps.scala:46-75): mask = semi/anti join, accum = eWiseAdd
    * with the previous output. */
  def extract(from: GrMatrix, rows: GrRange, cols: GrRange,
              mask: Option[GrMatrix] = None, complement: Boolean = false,
              accum: Option[BinaryOp] = None, previous: Option[GrMatrix] = None): GrMatrix = {
    val p = Seq(rows.pred(col("i")), cols.pred(col("j"))).flatten
      .reduceOption(_ && _).getOrElse(lit(true))
    finish(GrMatrix(from.df.filter(p)), mask, complement, accum, previous)
  }

  /** target⟨mask⟩(I,J) ⊙= from — immutably rebuilt (reference assign,
    * grbv2/MatrixOps.scala:78-105, which takes mask and accum like every
    * kernel op). GraphBLAS semantics without REPLACE: cells outside the
    * (I,J) region are untouched; inside the region, mask-false cells keep
    * their old value; mask-true cells get `from` — combined with the old
    * value via `accum` when given, else replacing it (a mask-true cell with
    * no `from` entry is deleted without accum, kept with accum — eWiseAdd's
    * union semantics give the latter for free). */
  def assign(target: GrMatrix, rows: GrRange, cols: GrRange, from: GrMatrix,
             mask: Option[GrMatrix] = None, complement: Boolean = false,
             accum: Option[BinaryOp] = None): GrMatrix = {
    val p = Seq(rows.pred(col("i")), cols.pred(col("j"))).flatten
      .reduceOption(_ && _).getOrElse(lit(true))
    val outside = target.df.filter(!p)
    val regionOld = GrMatrix(target.df.filter(p))
    val maskKeys = mask.map(_.df.select(col("i"), col("j")))
    // `from` is clipped to the (I,J) region: an out-of-region source cell
    // must not leak into the output (it would DUPLICATE a coordinate the
    // `outside` branch already kept — a corrupt COO with two values at one
    // cell), per the "cells outside the region are untouched" contract
    val fromIn = from.df.filter(p)
    val maskedNew = maskKeys match {
      case Some(mk) => GrMatrix(fromIn.join(mk, Seq("i", "j"),
        if (complement) "left_anti" else "left_semi"))
      case None => GrMatrix(fromIn)
    }
    val region = accum match {
      case Some(op) => eWiseAdd(op)(regionOld, maskedNew)
      case None =>
        // mask-false region cells survive the overwrite
        val kept = maskKeys match {
          case Some(mk) => regionOld.df.join(mk, Seq("i", "j"),
            if (complement) "left_semi" else "left_anti")
          case None => regionOld.df.filter(lit(false))
        }
        GrMatrix(maskedNew.df.select(col("i"), col("j"), col("v")).unionByName(kept))
    }
    GrMatrix(outside.unionByName(region.df.select(col("i"), col("j"), col("v"))))
  }

  /** Per-row reduction to a vector (reference reduceRows, grbv2/GrBMatrix.scala:50-65). */
  def reduceRows(m: Monoid)(A: GrMatrix): GrVector =
    GrVector(A.df.groupBy(col("i")).agg(m.agg(col("v")).as("v")))

  /** Per-column reduction (reference reduceColumns via Input0=Transpose descriptor). */
  def reduceCols(m: Monoid)(A: GrMatrix): GrVector =
    GrVector(A.df.groupBy(col("j").as("i")).agg(m.agg(col("v")).as("v")))

  /** Whole-matrix fold (reference reduceAll, grb/Reduce.scala:7-24).
    * Empty-input contract: SQL-aggregate monoids (plus/min/max/lor/land)
    * return a NULL scalar over zero cells — SQL semantics, not the
    * GraphBLAS identity; the typed [[Ops.timesM]] Aggregator returns its
    * fold zero (1.0). Callers folding possibly-empty matrices should
    * coalesce with their monoid's identity. */
  def reduceAll(m: Monoid)(A: GrMatrix): DataFrame =
    A.df.agg(m.agg(col("v")).as("v"))

  /** Vector → diagonal matrix (reference Diag.diag, grbv2/Diag.scala:7-24). */
  def diag(v: GrVector): GrMatrix =
    GrMatrix(v.df.select(col("i"), col("i").as("j"), col("v")))

  /** Structural equality (reference isAll with eq + land reduce,
    * grbv2/MatrixOps.scala:108-160): multiset equality of the two COO sets
    * as ONE signed-count aggregate (+1/−1 per side, all group sums must be
    * 0) — one shuffle over both inputs, where the previous double-exceptAll
    * paid two anti-join jobs. */
  def isAll(A: GrMatrix, B: GrMatrix): Boolean =
    A.df.select(col("i"), col("j"), col("v")).withColumn("__s", lit(1L))
      .unionByName(
        B.df.select(col("i"), col("j"), col("v")).withColumn("__s", lit(-1L)))
      .groupBy("i", "j", "v").agg(sum(col("__s")).as("__d"))
      .filter(col("__d") =!= 0).isEmpty

  /** Single-cell upsert: anti-select the target cell, union the new value
    * (reference element set, grbv2/GrBMatrix.scala:32-46 — here an immutable
    * rebuild, the same shape as [[assign]] at 1×1 granularity). */
  def setElement(m: GrMatrix, i: Long, j: Long, v: Any): GrMatrix = {
    val cell = m.df.sparkSession.range(1)
      .select(lit(i).as("i"), lit(j).as("j"),
        lit(v).cast(m.df.schema("v").dataType).as("v"))
    GrMatrix(m.df.filter(!(col("i") === i && col("j") === j)).unionByName(cell))
  }

  /** Single-cell delete (reference removeElement, grbv2/GrBMatrix.scala:44-46). */
  def removeElement(m: GrMatrix, i: Long, j: Long): GrMatrix =
    GrMatrix(m.df.filter(!(col("i") === i && col("j") === j)))

  /** Point read (reference get, grbv2/GrBMatrix.scala:32-38). The one
    * intentionally driver-side op: a single-cell probe with both predicates
    * pushed to the scan. */
  def getElement(m: GrMatrix, i: Long, j: Long): Option[Any] =
    m.df.filter(col("i") === i && col("j") === j).select("v")
      .limit(1).collect().headOption.map(_.get(0))

  /** Apply mask then fold the accumulator with the previous output
    * (reference mask/accum args threaded through every op, MatrixOps.scala:164-171). */
  private def finish(out: GrMatrix, mask: Option[GrMatrix], complement: Boolean,
                     accum: Option[BinaryOp], previous: Option[GrMatrix]): GrMatrix = {
    val masked = mask match {
      case Some(m) =>
        val mk = m.df.select(col("i"), col("j"))
        GrMatrix(out.df.join(mk, Seq("i", "j"), if (complement) "left_anti" else "left_semi"))
      case None => out
    }
    require(accum.isDefined == previous.isDefined,
      "accum and previous must be given together (an accumulator without " +
        "the previous output would silently overwrite instead of accumulate)")
    (accum, previous) match {
      case (Some(op), Some(prev)) => eWiseAdd(op)(prev, masked)
      case _ => masked
    }
  }

  /** Vector form of [[finish]]: mask = semi/anti join on i, accum = eWiseAdd
    * with the previous vector. */
  private def finishVec(out: GrVector, mask: Option[GrVector], complement: Boolean,
                        accum: Option[BinaryOp], previous: Option[GrVector]): GrVector = {
    val masked = mask match {
      case Some(m) =>
        GrVector(out.df.join(m.df.select(col("i")), Seq("i"),
          if (complement) "left_anti" else "left_semi"))
      case None => out
    }
    require(accum.isDefined == previous.isDefined,
      "accum and previous must be given together (an accumulator without " +
        "the previous output would silently overwrite instead of accumulate)")
    (accum, previous) match {
      case (Some(op), Some(prev)) => eWiseAddVec(op)(prev, masked)
      case _ => masked
    }
  }
}
