package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.kernel._

/**
 * Algebra properties of the DataFrame kernel, mirroring the reference's
 * ScalaCheck suites (g4s-sparse/src/test/scala/.../grbv2/MxMSpec.scala:21-71,
 * ElemWiseSpec.scala:15-77, ReduceSpec.scala:23-145, AssignSpec.scala:14-82,
 * DiagSpec.scala) with a driver-side Scala fold as the oracle. Deterministic
 * Gen sampling (fixed seeds) replaces the scalatest+scalacheck bridge, which
 * is not in the offline cache.
 */
class KernelSpec extends SparkSpec {

  private val dim = 6L
  private val cooGen: Gen[Map[(Long, Long), Double]] = for {
    n <- Gen.chooseNum(0, 12)
    cells <- Gen.listOfN(n, for {
      i <- Gen.chooseNum(0L, dim - 1)
      j <- Gen.chooseNum(0L, dim - 1)
      v <- Gen.chooseNum(1, 9)
    } yield ((i, j), v.toDouble))
  } yield cells.toMap

  private def sample(seed: Long): Map[(Long, Long), Double] =
    cooGen.pureApply(Gen.Parameters.default, Seed(seed))

  private def cases(n: Int): Seq[Long] = 1L to n.toLong

  private def mat(m: Map[(Long, Long), Double]): GrMatrix = {
    import spark.implicits._
    GrMatrix(m.toSeq.map { case ((i, j), v) => (i, j, v) }.toDF("i", "j", "v"))
  }

  private def toMap(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  /** Driver-side mxm oracle over (plus,times) = fold semantics. */
  private def mxmOracle(a: Map[(Long, Long), Double], b: Map[(Long, Long), Double],
                        plus: (Double, Double) => Double, times: (Double, Double) => Double): Map[(Long, Long), Double] =
    (for {
      ((ai, aj), av) <- a.toSeq
      ((bi, bj), bv) <- b.toSeq if aj == bi
    } yield ((ai, bj), times(av, bv)))
      .groupMapReduce(_._1)(_._2)(plus)

  private def unionOracle(a: Map[(Long, Long), Double], b: Map[(Long, Long), Double],
                          op: (Double, Double) => Double): Map[(Long, Long), Double] =
    (a.keySet ++ b.keySet).map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => op(x, y)
        case (Some(x), None) => x
        case (None, Some(y)) => y
        case _ => 0.0
      })
    }.toMap

  test("mxm plus-times and min-plus match driver-side fold oracle") {
    cases(4).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      assert(toMap(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b)).df) == mxmOracle(a, b, _ + _, _ * _))
      assert(toMap(GrOps.mxm(Ops.minPlus)(mat(a), mat(b)).df) == mxmOracle(a, b, math.min, _ + _))
    }
  }

  test("mxm is associative: (AB)C == A(BC) over plus-times") {
    cases(3).foreach { s =>
      val (a, b, c) = (sample(s), sample(s + 100), sample(s + 200))
      val ab_c = GrOps.mxm(Ops.plusTimes)(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b)), mat(c))
      val a_bc = GrOps.mxm(Ops.plusTimes)(mat(a), GrOps.mxm(Ops.plusTimes)(mat(b), mat(c)))
      assert(toMap(ab_c.df) == toMap(a_bc.df))
    }
  }

  test("anyPair mxm = structural join+distinct") {
    cases(3).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      val got = GrOps.mxm(Ops.anyPair)(mat(a), mat(b)).df
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == mxmOracle(a, b, _ + _, _ * _).keySet)
    }
  }

  test("eWiseAdd/eWiseMult match union/intersect oracles") {
    cases(4).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      assert(toMap(GrOps.eWiseAdd(Ops.plus)(mat(a), mat(b)).df) == unionOracle(a, b, _ + _))
      val mult = toMap(GrOps.eWiseMult(Ops.times)(mat(a), mat(b)).df)
      assert(mult == (a.keySet intersect b.keySet).map(k => k -> a(k) * b(k)).toMap)
    }
  }

  test("reduceRows/reduceCols/reduceAll match fold oracles") {
    cases(4).foreach { s =>
      val a = sample(s)
      val rows = GrOps.reduceRows(Ops.plusM)(mat(a)).df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rows == a.groupMapReduce(_._1._1)(_._2)(_ + _))
      val cols = GrOps.reduceCols(Ops.minM)(mat(a)).df.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(cols == a.groupMapReduce(_._1._2)(_._2)(math.min))
      if (a.nonEmpty) {
        val all = GrOps.reduceAll(Ops.plusM)(mat(a)).collect()(0).getDouble(0)
        assert(math.abs(all - a.values.sum) < 1e-9)
      }
    }
  }

  test("transpose involution; diag; extract/assign round-trip") {
    cases(4).foreach { s =>
      val a = sample(s)
      assert(toMap(mat(a).transpose.transpose.df) == a)
      val m = mat(a)
      val span = Span(0, 2)
      val back = GrOps.assign(m, span, All, GrOps.extract(m, span, All))
      assert(toMap(back.df) == a)
      val d = GrOps.diag(GrOps.reduceRows(Ops.maxM)(m))
      assert(d.df.collect().forall(r => r.getLong(0) == r.getLong(1)))
    }
  }

  test("stride/backwards extract-assign matches the enumerated range") {
    // reference GrBRange GxB_STRIDE / GxB_BACKWARDS (grbv2/GrBRange.scala:7-45):
    // start..end inclusive stepping by inc; negative inc steps DOWN
    cases(4).foreach { s =>
      val a = sample(s)
      for ((st, en, inc) <- Seq((0L, 5L, 2L), (1L, 5L, 3L), (5L, 0L, -2L), (4L, 1L, -3L))) {
        val want = (st to en by inc).toSet
        val ex = toMap(GrOps.extract(mat(a), Stride(st, en, inc), All).df)
        assert(ex == a.view.filterKeys(k => want(k._1)).toMap, s"rows $st..$en by $inc")
        val exCols = toMap(GrOps.extract(mat(a), All, Stride(st, en, inc)).df)
        assert(exCols == a.view.filterKeys(k => want(k._2)).toMap, s"cols $st..$en by $inc")
        // round-trip: assigning the strided extract back is the identity
        val back = GrOps.assign(mat(a), Stride(st, en, inc), All,
          GrOps.extract(mat(a), Stride(st, en, inc), All))
        assert(toMap(back.df) == a, s"round-trip $st..$en by $inc")
      }
    }
    intercept[IllegalArgumentException] { Stride(0, 5, 0) }
  }

  test("mask, complement mask, and accumulator") {
    cases(3).foreach { s =>
      val (a, b, mk) = (sample(s), sample(s + 100), sample(s + 200))
      val full = toMap(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b)).df)
      val masked = toMap(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b), mask = Some(mat(mk))).df)
      assert(masked == full.view.filterKeys(mk.keySet).toMap)
      val anti = toMap(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b), mask = Some(mat(mk)), complement = true).df)
      assert(anti == full.view.filterKeys(k => !mk.keySet(k)).toMap)
      val acc = toMap(GrOps.mxm(Ops.plusTimes)(mat(a), mat(b),
        accum = Some(Ops.plus), previous = Some(mat(mk))).df)
      assert(acc == unionOracle(full, mk, _ + _))
    }
  }

  test("extract/assign with mask and accumulator match driver oracles") {
    // reference extract/assign thread mask+accum like every kernel op
    // (grbv2/MatrixOps.scala:46-105)
    cases(3).foreach { s =>
      val (a, mk, prev) = (sample(s), sample(s + 100), sample(s + 200))
      val from = sample(s + 300).view.filterKeys(_._1 <= 2).toMap
      val span = Span(0, 2)
      def inSpan(k: (Long, Long)): Boolean = k._1 >= 0 && k._1 <= 2
      val exM = toMap(GrOps.extract(mat(a), span, All, mask = Some(mat(mk))).df)
      assert(exM == a.view.filterKeys(k => inSpan(k) && mk.contains(k)).toMap)
      val exC = toMap(GrOps.extract(mat(a), span, All,
        mask = Some(mat(mk)), complement = true).df)
      assert(exC == a.view.filterKeys(k => inSpan(k) && !mk.contains(k)).toMap)
      val exA = toMap(GrOps.extract(mat(a), span, All,
        accum = Some(Ops.plus), previous = Some(mat(prev))).df)
      assert(exA == unionOracle(a.view.filterKeys(inSpan).toMap, prev, _ + _))
      // masked overwrite: mask-true region cells take `from` (absent `from`
      // cell = delete), mask-false region cells keep their old value
      val asM = toMap(GrOps.assign(mat(a), span, All, mat(from), mask = Some(mat(mk))).df)
      assert(asM ==
        a.view.filterKeys(k => !inSpan(k)).toMap ++
        a.view.filterKeys(k => inSpan(k) && !mk.contains(k)).toMap ++
        from.view.filterKeys(mk.contains).toMap)
      // accumulating assign: the region folds old ⊕ new with union semantics
      val asA = toMap(GrOps.assign(mat(a), span, All, mat(from), accum = Some(Ops.plus)).df)
      assert(asA ==
        a.view.filterKeys(k => !inSpan(k)).toMap ++
        unionOracle(a.view.filterKeys(inSpan).toMap, from, _ + _))
    }
  }

  test("vxm BFS step: frontier × adjacency over anyPair") {
    import spark.implicits._
    val adj = GrMatrix(Seq((0L, 1L, true), (1L, 2L, true), (1L, 3L, true)).toDF("i", "j", "v"))
    val frontier = GrVector(Seq((0L, true)).toDF("i", "v"))
    val step1 = GrOps.vxm(Ops.anyPair)(frontier, adj)
    assert(step1.df.collect().map(_.getLong(0)).toSet == Set(1L))
    val step2 = GrOps.vxm(Ops.anyPair)(step1, adj)
    assert(step2.df.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("isAll structural equality") {
    cases(3).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      assert(GrOps.isAll(mat(a), mat(a)))
      if (a != b) assert(!GrOps.isAll(mat(a), mat(b)))
    }
  }

  test("rminus/rdiv and IS* comparison ops match fold oracles") {
    cases(3).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      val inter = a.keySet intersect b.keySet
      assert(toMap(GrOps.eWiseMult(Ops.rminus)(mat(a), mat(b)).df) ==
        inter.map(k => k -> (b(k) - a(k))).toMap)
      assert(toMap(GrOps.eWiseMult(Ops.rdiv)(mat(a), mat(b)).df) ==
        inter.map(k => k -> (b(k) / a(k))).toMap)
      // IS* return 0/1 in the numeric domain (int, upcast by the collect)
      def isOracle(cmp: (Double, Double) => Boolean) =
        inter.map(k => k -> (if (cmp(a(k), b(k))) 1 else 0)).toMap
      def run(op: BinaryOp) = GrOps.eWiseMult(op)(mat(a), mat(b)).df.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
      assert(run(Ops.iseq) == isOracle(_ == _))
      assert(run(Ops.isne) == isOracle(_ != _))
      assert(run(Ops.isgt) == isOracle(_ > _))
      assert(run(Ops.islt) == isOracle(_ < _))
      assert(run(Ops.isge) == isOracle(_ >= _))
      assert(run(Ops.isle) == isOracle(_ <= _))
    }
  }

  test("exact times monoid handles negatives and zeros (reduce vs fold)") {
    import spark.implicits._
    val m = GrMatrix(Seq(
      (0L, 0L, 2.0), (0L, 1L, -3.0), (0L, 2L, 0.5),
      (1L, 0L, 0.0), (1L, 1L, -4.0),
      (2L, 2L, -1.5)).toDF("i", "j", "v"))
    val rows = GrOps.reduceRows(Ops.timesM)(m).df.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows == Map(0L -> -3.0, 1L -> 0.0, 2L -> -1.5))
    val all = GrOps.reduceAll(Ops.timesM)(m).collect()(0).getDouble(0)
    assert(all == 0.0) // the zero cell annihilates — exp∘Σ∘log could not do this
  }

  test("eWiseAdd/eWiseMult accumulator and vxm mask/accum") {
    cases(3).foreach { s =>
      val (a, b, prev) = (sample(s), sample(s + 100), sample(s + 200))
      val add = toMap(GrOps.eWiseAdd(Ops.plus)(mat(a), mat(b)).df)
      val addAcc = toMap(GrOps.eWiseAdd(Ops.plus)(mat(a), mat(b),
        accum = Some(Ops.plus), previous = Some(mat(prev))).df)
      assert(addAcc == unionOracle(add, prev, _ + _))
      val mult = toMap(GrOps.eWiseMult(Ops.times)(mat(a), mat(b)).df)
      val multAcc = toMap(GrOps.eWiseMult(Ops.times)(mat(a), mat(b),
        accum = Some(Ops.min), previous = Some(mat(prev))).df)
      assert(multAcc == unionOracle(mult, prev, math.min))
    }
    import spark.implicits._
    val adj = GrMatrix(Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 2L, 4.0)).toDF("i", "j", "v"))
    val u = GrVector(Seq((0L, 10.0), (1L, 20.0)).toDF("i", "v"))
    def vecMap(v: GrVector) = v.df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // w(j) = min_i (u(i) + adj(i,j)): 1 -> 11, 2 -> min(12, 24) = 12
    assert(vecMap(GrOps.vxm(Ops.minPlus)(u, adj)) == Map(1L -> 11.0, 2L -> 12.0))
    val mask = GrVector(Seq((2L, true)).toDF("i", "v"))
    assert(vecMap(GrOps.vxm(Ops.minPlus)(u, adj, mask = Some(mask))) == Map(2L -> 12.0))
    assert(vecMap(GrOps.vxm(Ops.minPlus)(u, adj, mask = Some(mask), complement = true)) ==
      Map(1L -> 11.0))
    val prevV = GrVector(Seq((1L, 100.0), (5L, 7.0)).toDF("i", "v"))
    assert(vecMap(GrOps.vxm(Ops.minPlus)(u, adj,
      accum = Some(Ops.plus), previous = Some(prevV))) ==
      Map(1L -> 111.0, 2L -> 12.0, 5L -> 7.0))
  }

  test("user-defined op NAMED 'pair' does not trigger the ANY_PAIR fast path") {
    // the existence-only shortcut must fire on object identity with the
    // catalog ops, not on the name — a user semiring named any/pair with
    // different semantics gets the general join+aggregate path
    val F = org.apache.spark.sql.functions
    val userAny = Monoid("any")(F.min)((x, _) => x)
    val userPair = BinaryOp("pair")((x, y) => x + y) // NOT existence-only
    val impostor = Semiring(userAny, userPair)
    cases(3).foreach { s =>
      val (a, b) = (sample(s), sample(s + 100))
      assert(toMap(GrOps.mxm(impostor)(mat(a), mat(b)).df) ==
        mxmOracle(a, b, math.min, _ + _))
      // and the genuine catalog semiring still takes the structural path
      val structural = GrOps.mxm(Ops.anyPair)(mat(a), mat(b)).df
      assert(structural.schema("v").dataType == org.apache.spark.sql.types.BooleanType)
    }
  }

  test("pages reassemble to the matrix at sizes 1/2/3/5/100") {
    // mirrors reference BlockingMatrixTest's toStream round-trip
    // (g4s-optimizer/src/test/scala/.../BlockingMatrixTest.scala)
    cases(2).foreach { s =>
      val a = sample(s)
      val m = mat(a).df.repartition(3) // multiple partitions: pages span them
      Seq(1, 2, 3, 5, 100).foreach { ps =>
        val pgs = GrMatrix(m).pages(ps).toSeq
        assert(pgs.forall { case (is, js, vs) =>
          is.length <= ps && is.length == js.length && js.length == vs.length })
        if (a.nonEmpty) assert(pgs.init.forall(_._1.length == ps)) // only last ragged
        val rebuilt = pgs.flatMap { case (is, js, vs) =>
          is.indices.map(k => ((is(k), js(k)), vs(k).asInstanceOf[Double])) }.toMap
        assert(rebuilt == a && pgs.map(_._1.length).sum == a.size)
      }
    }
  }

  test("element get/set/remove point ops (immutably rebuilt)") {
    import spark.implicits._
    val m = GrMatrix(Seq((0L, 0L, 1.0), (1L, 2L, 3.0)).toDF("i", "j", "v"))
    assert(GrOps.getElement(m, 1, 2).contains(3.0))
    assert(GrOps.getElement(m, 4, 4).isEmpty)
    val set = GrOps.setElement(m, 1, 2, 9.0)         // overwrite
    assert(toMap(set.df) == Map((0L, 0L) -> 1.0, (1L, 2L) -> 9.0))
    val ins = GrOps.setElement(m, 5, 5, 2.5)         // insert
    assert(toMap(ins.df) == Map((0L, 0L) -> 1.0, (1L, 2L) -> 3.0, (5L, 5L) -> 2.5))
    val rm = GrOps.removeElement(m, 0, 0)
    assert(toMap(rm.df) == Map((1L, 2L) -> 3.0))
    assert(toMap(GrOps.removeElement(m, 9, 9).df) == toMap(m.df)) // absent = no-op
    assert(m.clear.nvals == 0 && (m.duplicate eq m))
  }

  test("assign clips `from` to the (I,J) region — no leak, no duplicate cells") {
    // target holds (5,5)=1; `from` smuggles a (5,5)=9 OUTSIDE the assigned
    // 0..2 region — the old code unioned both rows (two values at one cell)
    val target = mat(Map((5L, 5L) -> 1.0, (1L, 1L) -> 2.0))
    val from = mat(Map((5L, 5L) -> 9.0, (0L, 0L) -> 3.0))
    val out = GrOps.assign(target, Span(0L, 2L), Span(0L, 2L), from)
    val got = toMap(out.df)
    assert(got == Map((5L, 5L) -> 1.0, (0L, 0L) -> 3.0),
      s"out-of-region from-cells must not leak (region replaces (1,1)): $got")
    assert(out.df.groupBy("i", "j").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).isEmpty,
      "a COO matrix must never hold two values at one coordinate")
  }

  test("accum without previous rejects instead of silently overwriting") {
    val a = mat(Map((0L, 0L) -> 1.0))
    intercept[IllegalArgumentException](
      GrOps.mxm(Ops.plusTimes)(a, a, accum = Some(Ops.plus)))
    intercept[IllegalArgumentException](
      GrOps.extract(a, All, All, previous = Some(a)))
  }

  test("isAll: multiset semantics incl. duplicate-sensitive and empty cases") {
    val a = mat(Map((0L, 0L) -> 1.0, (1L, 2L) -> 3.0))
    val b = mat(Map((1L, 2L) -> 3.0, (0L, 0L) -> 1.0))
    assert(GrOps.isAll(a, b) && GrOps.isAll(b, a))
    assert(!GrOps.isAll(a, mat(Map((0L, 0L) -> 1.0))))
    val dup = {
      import spark.implicits._
      GrMatrix(Seq((0L, 0L, 1.0), (0L, 0L, 1.0)).toDF("i", "j", "v"))
    }
    assert(!GrOps.isAll(a, dup) && !GrOps.isAll(dup, mat(Map((0L, 0L) -> 1.0))))
    assert(GrOps.isAll(mat(Map.empty), mat(Map.empty)))
  }
}
