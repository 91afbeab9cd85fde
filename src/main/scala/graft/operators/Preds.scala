package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.cypher.Ast

/**
 * WHERE predicate → Catalyst Column, shared by the pushdown path (PatternExec
 * filters the node/edge scan, columns are bare property names) and the
 * residual path (GraphDB filters matched rows, columns are `binding_prop`) —
 * the `resolve` function is the only difference between the two.
 *
 * Null semantics match Cypher's ternary logic for free: a comparison over a
 * null property yields null, `!null` stays null, and Spark's Filter drops
 * non-true rows — exactly Cypher's "null is not true".
 */
object Preds {
  /** Sentinel "property" name routing `keys(b)` in an expression position
    * through the (binding, prop) resolver: the match compiler intercepts it
    * and substitutes the present-key array built from the binding's
    * joined-back property columns (GraphDB). The leading space can't
    * collide with a real property name (idents never contain one). */
  val KeysProp = " keys"

  /** openCypher value functions (names lowercased by the parser) → Column
    * transforms, shared by the match path (over `binding_prop` columns) and
    * the post-WITH path (over bare stage columns). Numeric returns follow
    * Spark's native types (ceil/floor → BIGINT, size → length cast LONG);
    * oracle SQL casts to match. */
  val valueFn: Map[String, Column => Column] = Map(
    "toupper"   -> (c => upper(c)),
    "tolower"   -> (c => lower(c)),
    "trim"      -> (c => trim(c)),
    "size"      -> (c => length(c).cast("long")),
    "abs"       -> (c => abs(c)),
    "ceil"      -> (c => ceil(c)),
    "floor"     -> (c => floor(c)),
    "round"     -> (c => round(c)),
    "sqrt"      -> (c => sqrt(c)),
    "sign"      -> (c => signum(c)),
    "tointeger" -> (c => c.cast("long")),
    "tofloat"   -> (c => c.cast("double")),
    "tostring"  -> (c => c.cast("string")),
    // openCypher toBoolean() returns null on unparseable input; a plain
    // cast raises under ANSI mode (which this repo targets), so gate on
    // the canonical spellings and let the un-matched when() yield null
    "toboolean" -> (c => {
      val s = lower(trim(c.cast("string")))
      when(s === "true", lit(true)).when(s === "false", lit(false))
    }),
    "reverse"   -> (c => reverse(c)),
    "ltrim"     -> (c => ltrim(c)),
    "rtrim"     -> (c => rtrim(c)),
    "exp"       -> (c => exp(c)),
    "log"       -> (c => log(c)),   // natural log, openCypher log()
    "log10"     -> (c => log10(c)),
    // list accessors for collect()ed columns (element_at is 1-based; -1 is
    // the last element) — array columns only, loud analysis error elsewhere
    "head"      -> (c => element_at(c, 1)),
    "last"      -> (c => element_at(c, -1)))

  def column(p: Ast.Pred, resolve: (String, String) => Column): Column =
    column(p, resolve, pp => throw new IllegalArgumentException(
      s"pattern predicate is not supported in this position: ${pp.path}"))

  private def cmpOp(c: Column, op: String, v: Column): Column = op match {
    case "="           => c === v
    case "<>"          => c =!= v
    case "<"           => c < v
    case "<="          => c <= v
    case ">"           => c > v
    case ">="          => c >= v
    case "STARTS WITH" => c.startsWith(v)
    case "ENDS WITH"   => c.endsWith(v)
    case "CONTAINS"    => c.contains(v)
    // openCypher `=~` matches the ENTIRE string (Java matches(), not
    // find()) — anchor the pattern; `(?:…)` keeps user alternations intact
    case "=~"          => regexp_like(c, concat(lit("^(?:"), v, lit(")$")))
    case other => throw new IllegalArgumentException(s"unknown operator $other")
  }

  /** `pat` resolves a nested pattern predicate to its pre-joined exists-flag
    * column (GraphDB.run joins one boolean flag per distinct pattern before
    * filtering; bare / NOT-ed conjuncts never reach here — they compile to
    * semi/anti joins instead). */
  def column(p: Ast.Pred, resolve: (String, String) => Column,
             pat: Ast.PatPred => Column): Column = p match {
    case pp: Ast.PatPred => pat(pp)
    case Ast.Cmp(b, prop, op, v) =>
      val c = resolve(b, prop)
      op match {
        // empty list → always-false literal (Cypher: `x IN []` is false);
        // isin() with no args would be an analysis error
        case "IN" => v.asInstanceOf[Seq[Any]] match {
          case Seq() => lit(false)
          case vs    => c.isin(vs: _*)
        }
        case _ => cmpOp(c, op, lit(v))
      }
    case Ast.CmpE(l, op, r) =>
      cmpOp(exprColumn(l, resolve, pat), op, exprColumn(r, resolve, pat))
    case Ast.And(l, r)            => column(l, resolve, pat) && column(r, resolve, pat)
    case Ast.Or(l, r)             => column(l, resolve, pat) || column(r, resolve, pat)
    case Ast.Not(x)               => !column(x, resolve, pat)
    case Ast.IsNull(b, prop, neg) =>
      if (neg) resolve(b, prop).isNotNull else resolve(b, prop).isNull
  }

  def exprColumn(e: Ast.Expr, resolve: (String, String) => Column): Column =
    exprColumn(e, resolve, pp => throw new IllegalArgumentException(
      s"pattern predicate is not supported in this position: ${pp.path}"))

  /** Resolver for a lambda scope: `name` reads the lambda Column, property
    * access on it is an error, everything else defers to the outer scope. */
  private def lambdaResolve(name: String, x: Column,
                            outer: (String, String) => Column): (String, String) => Column =
    (b, p) =>
      if (b == name) {
        if (p.nonEmpty) throw new IllegalArgumentException(
          s"$b.$p: a list variable binds scalar elements — it has no properties")
        x
      } else outer(b, p)

  /** Value expression → one Catalyst Column. Nothing here leaves the
    * built-in expression library (no UDF); everything but the list
    * higher-order functions stays inside whole-stage codegen.
    * `resolve(binding, prop)` is the same resolver [[column]] takes —
    * prop "" is a bare reference (the binding's id column over a match, a
    * bare stage column post-WITH). */
  def exprColumn(e: Ast.Expr, resolve: (String, String) => Column,
                 pat: Ast.PatPred => Column): Column = e match {
    // pattern-valued expressions are rewritten to joined-column refs by the
    // MATCH compiler before reaching here; any other position is unsupported
    case Ast.EPatAgg(k, pp, _) => throw new graft.cypher.ParseException(
      (if (k == "count") s"size(${pp.path})" else "a pattern comprehension") +
        " is only supported over a MATCH (items or WHERE), not in this position")
    case Ast.ERef(b, p)  => resolve(b, p.getOrElse(""))
    case Ast.ELit(v)     => lit(v)
    case Ast.EListLit(vs) => array(vs.map(lit): _*)
    // list predicates / comprehension / reduce compile to Spark's built-in
    // higher-order functions — per-row Catalyst expressions, no UDF, no
    // explode. (HOFs are CodegenFallback by Spark's own design: the lambda
    // is interpreted, but input decoding/encoding stays columnar and the
    // surrounding stage keeps whole-stage codegen.)
    case Ast.EListPred(kind, v, l, p) =>
      val lc = exprColumn(l, resolve, pat)
      def lam(x: Column) = column(p, lambdaResolve(v, x, resolve), pat)
      kind match {
        case "any"    => exists(lc, x => lam(x))
        case "all"    => forall(lc, x => lam(x))
        case "none"   => !exists(lc, x => lam(x))
        case "single" => size(filter(lc, (x: Column) => lam(x))) === 1
      }
    case Ast.EListComp(v, l, p, proj) =>
      val lc = exprColumn(l, resolve, pat)
      val filtered = p.fold(lc)(pp =>
        filter(lc, x => column(pp, lambdaResolve(v, x, resolve), pat)))
      proj.fold(filtered)(e2 =>
        transform(filtered, x => exprColumn(e2, lambdaResolve(v, x, resolve), pat)))
    case Ast.EReduce(acc, init, v, l, body) =>
      val lc = exprColumn(l, resolve, pat)
      aggregate(lc, exprColumn(init, resolve, pat),
        (a, x) => exprColumn(body, lambdaResolve(acc, a, lambdaResolve(v, x, resolve)), pat))
    case Ast.ENeg(x)     => -exprColumn(x, resolve, pat)
    case Ast.EBin(op, l, r) =>
      val (cl, cr) = (exprColumn(l, resolve, pat), exprColumn(r, resolve, pat))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr // SQL semantics: integer operands yield double
        case "%" => cl % cr
        case other => throw new IllegalArgumentException(s"unknown operator $other")
      }
    case Ast.EFn("coalesce", args) =>
      coalesce(args.map(exprColumn(_, resolve, pat)): _*)
    // size() is string-length by default (valueFn), but over an expression
    // statically known to yield a LIST (split / range) it counts elements —
    // openCypher size() covers both, and the arg's shape is known at compile
    case Ast.EFn("size", Seq(a @ (Ast.EFn("split" | "range", _) | _: Ast.EListComp |
                                  _: Ast.EListLit))) =>
      size(exprColumn(a, resolve, pat)).cast("long")
    case Ast.EFn(f, Seq(a)) if valueFn.contains(f) =>
      valueFn(f)(exprColumn(a, resolve, pat))
    // openCypher substring is 0-based; Spark substr is 1-based. A missing
    // length means "to the end of the string".
    case Ast.EFn("substring", args) =>
      val s = exprColumn(args(0), resolve, pat)
      val st = exprColumn(args(1), resolve, pat)
      val len = if (args.size > 2) exprColumn(args(2), resolve, pat) else length(s)
      s.substr(st + lit(1), len)
    case Ast.EFn("replace", Seq(a, find, repl)) =>
      replace(exprColumn(a, resolve, pat), exprColumn(find, resolve, pat),
        exprColumn(repl, resolve, pat))
    case Ast.EFn("left", Seq(a, n)) =>
      exprColumn(a, resolve, pat).substr(lit(1), exprColumn(n, resolve, pat))
    case Ast.EFn("right", Seq(a, n)) =>
      val c = exprColumn(a, resolve, pat)
      val nn = exprColumn(n, resolve, pat)
      // clamp the start at 1 so n > length returns the whole string
      c.substr(greatest(length(c) - nn + lit(1), lit(1)), nn)
    // openCypher split() splits on a LITERAL delimiter; Spark's split takes a
    // regex, so the delimiter must be a string literal we can regex-quote at
    // compile time (an expression-valued delimiter can't be safely quoted).
    case Ast.EFn("split", Seq(a, d)) =>
      d match {
        case Ast.ELit(s: String) =>
          split(exprColumn(a, resolve, pat), java.util.regex.Pattern.quote(s))
        case _ => throw new IllegalArgumentException(
          "split() requires a string-literal delimiter")
      }
    // openCypher range(start, end[, step]) — inclusive both ends. Spark's
    // sequence() AUTO-REVERSES when start > end (and raises when the step
    // sign points away from end); openCypher returns the EMPTY list in both
    // cases, so guard: direction mismatch → typed empty array, and the step
    // defaults to an explicit +1 (never let sequence() infer direction).
    // Matches the UNWIND range() row source (GraphDB.runUnwindRange).
    case Ast.EFn("range", args) =>
      val cs = args.map(exprColumn(_, resolve, pat).cast("long"))
      val (start, end) = (cs(0), cs(1))
      val step = if (cs.size == 3) cs(2) else lit(1L)
      when((step > 0 && start > end) || (step < 0 && start < end),
        array().cast("array<bigint>"))
        .otherwise(sequence(start, end, step))
    // `join(list, sep)`: render a list as one string (the canonical way to
    // make list-valued results comparable across engines — arrays don't
    // sort/hash portably). Elements stringify via cast; DuckDB twin is
    // array_to_string(). Separator must be a literal (mirrors split()).
    case Ast.EFn("join", Seq(l, d)) =>
      d match {
        case Ast.ELit(s: String) =>
          array_join(exprColumn(l, resolve, pat).cast("array<string>"), s)
        case _ => throw new IllegalArgumentException(
          "join() requires a string-literal separator")
      }
    // keys(b) in an expression position (e.g. join(keys(n), ',')): routed
    // through the resolver with the KeysProp sentinel — only the match
    // compiler can answer it (it owns the property join-back)
    case Ast.EFn("keys", Seq(Ast.ERef(b, p))) =>
      if (p.exists(_.nonEmpty)) throw new IllegalArgumentException(
        s"keys() takes a node binding, not a property")
      resolve(b, KeysProp)
    case Ast.EFn(f, _) => throw new IllegalArgumentException(s"unknown function $f")
    case Ast.ECase(whens, dflt) =>
      val branches = whens.map { case (p, v) =>
        (column(p, resolve, pat), exprColumn(v, resolve, pat))
      }
      val head = when(branches.head._1, branches.head._2)
      val chained = branches.tail.foldLeft(head) { case (acc, (c, v)) => acc.when(c, v) }
      dflt.fold(chained)(d => chained.otherwise(exprColumn(d, resolve, pat)))
  }
}
